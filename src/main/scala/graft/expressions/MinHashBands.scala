package graft.expressions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The WHOLE md5 LSH band-key pipeline fused into one pass over the raw
  * text bytes: `word_shingles(text, n)` → `minhash_sig(·, hashes)` →
  * per-band `md5(concat(sig slices))`, emitted as an array of `bands`
  * band-key hex strings.
  *
  * Value-identical to the composed form (the DuckDB-parity contract of
  * the q31/q47/q92/q113 pipelines), because every md5 sees the same
  * bytes:
  *
  *  - Words are `split(text, " ", -1)` semantics — every 0x20 byte is a
  *    separator (space is a single byte in UTF-8, never part of a
  *    multi-byte sequence), consecutive/trailing separators yield empty
  *    words. A shingle of words i..i+n−1 joined by single spaces is then
  *    EXACTLY the byte range [start(i), end(i+n−1)) of the original
  *    text, so each shingle's md5 is computed straight off the input
  *    buffer — no shingle strings, no per-shingle allocation (the
  *    composed form allocated the full shingle array per row: ~n× the
  *    text bytes in fresh strings, the dominant non-md5 cost of the
  *    signature pass).
  *  - Signature component j is the minimum 16-bit value of md5 bytes
  *    [2j, 2j+2) over shingles — [[MinHashMath]]'s exact slice, whose
  *    numeric order equals the lexicographic order of hex chars
  *    [4j, 4j+4).
  *  - Band b's key is the md5 hex of the ASCII concatenation of its
  *    `hashes/bands` components formatted %04x — byte-for-byte what
  *    `md5(concat(element_at(sig, …)…))` hashed.
  *
  * Null contract: null text → null; fewer than `n` words → null (the
  * callers filter those rows out before this expression; an exploded
  * null array yields no rows, same outcome).
  */
case class MinHashBands(child: Expression, hashes: Int, bands: Int, shingleN: Int)
    extends UnaryExpression {
  require(hashes >= 1 && hashes * 4 <= 32, "md5 slicing supports at most 8 components")
  require(bands >= 1 && hashes % bands == 0, "hashes must divide into bands")
  require(shingleN >= 1, "shingle width must be >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "minhash_bands"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName requires a string input, got $t")
  }

  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    MinHashBandsMath.bandKeys(input.asInstanceOf[UTF8String], hashes, bands, shingleN)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val f = s"graft.expressions.MinHashBandsMath$$.MODULE$$.bandKeys"
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = $f($c, $hashes, $bands, $shingleN);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashBands =
    copy(child = newChild)
}

object MinHashBandsMath {
  private val digests = ThreadLocal.withInitial[MessageDigest](() =>
    MessageDigest.getInstance("MD5"))
  private val hexDigits = "0123456789abcdef".getBytes

  /** Null when the text has fewer than `n` words (no shingles). */
  def bandKeys(text: UTF8String, hashes: Int, bands: Int, n: Int): ArrayData = {
    val bytes = text.getBytes
    // word boundaries: every 0x20 separates two words (split(" ", -1)
    // semantics — empty words kept)
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

    val md = digests.get()
    val mins = Array.fill(hashes)(Int.MaxValue)
    var s = 0
    val nShingles = nWords - n + 1
    while (s < nShingles) {
      val off = starts(s)
      md.reset()
      md.update(bytes, off, ends(s + n - 1) - off)
      val digest = md.digest()
      var j = 0
      while (j < hashes) {
        val v = ((digest(2 * j) & 0xff) << 8) | (digest(2 * j + 1) & 0xff)
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      s += 1
    }

    val perBand = hashes / bands
    val out = new Array[Any](bands)
    val ascii = new Array[Byte](perBand * 4) // the %04x-formatted slice
    var b = 0
    while (b < bands) {
      var j = 0
      while (j < perBand) {
        val v = mins(b * perBand + j)
        ascii(4 * j) = hexDigits((v >>> 12) & 0xf)
        ascii(4 * j + 1) = hexDigits((v >>> 8) & 0xf)
        ascii(4 * j + 2) = hexDigits((v >>> 4) & 0xf)
        ascii(4 * j + 3) = hexDigits(v & 0xf)
        j += 1
      }
      md.reset()
      val digest = md.digest(ascii)
      val hex = new Array[Byte](32)
      var d = 0
      while (d < 16) {
        hex(2 * d) = hexDigits((digest(d) >>> 4) & 0xf)
        hex(2 * d + 1) = hexDigits(digest(d) & 0xf)
        d += 1
      }
      out(b) = UTF8String.fromBytes(hex)
      b += 1
    }
    new GenericArrayData(out)
  }
}

object MinHashBands {
  def of(text: Column, hashes: Int, bands: Int, shingleN: Int): Column =
    org.apache.spark.sql.graft.Bridge.column(MinHashBands(
      org.apache.spark.sql.graft.Bridge.expression(text), hashes, bands, shingleN))
}
