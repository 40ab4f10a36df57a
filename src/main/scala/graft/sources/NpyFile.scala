package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** NumPy `.npy` array-file source — the interchange format of the
  * reference's 928-channel frequency grid
  * (`configuration_files/928ch_frequency_reference.npy`, consumed via the
  * project configs' `ref_freq_list` key — dm_offset_pta.config:37). A user
  * running those configs hits this format on the first decimation step.
  *
  * The format is NumPy's public NEP-1 spec: magic `\x93NUMPY`, one byte
  * each major/minor version, a little-endian header length (uint16 for
  * v1.0, uint32 for v2.0+), then a Python-literal dict
  * `{'descr': '<f8', 'fortran_order': False, 'shape': (928,), }` padded
  * with spaces to 64-byte alignment and newline-terminated, then the raw
  * array bytes. Numeric dtypes supported here: little-endian f8/f4/i8/i4/
  * i2 and single-byte i1/u1/b1 — the channel/frequency/weight references
  * a pipeline config points at are all 1-D numeric arrays (the real 928ch
  * file is `<f8`, shape (928,)).
  *
  * Values surface in STORAGE order; multi-dimensional C-order arrays
  * flatten row-major (callers index via the header shape). A
  * fortran-order multi-dim array is refused loudly rather than silently
  * mis-indexed.
  *
  * Scale shape: one npy file is a DIM (a channel map, kB–MB), so [[load]]
  * reads via Spark's `binaryFile` source — one task per file, many files
  * in parallel — and the parsed dim then broadcasts into fact joins
  * (q144's plan). Nothing here ever touches the driver except the plan.
  */
object NpyFile {

  final case class Header(descr: String, fortranOrder: Boolean,
                          shape: Seq[Long], dataOffset: Int) {
    def elementCount: Long = if (shape.isEmpty) 1L else shape.product
  }

  private val Magic: Array[Byte] =
    Array(0x93.toByte) ++ "NUMPY".getBytes(StandardCharsets.US_ASCII)

  /** Parse the header block (magic, version, length, literal dict). */
  def parseHeader(bytes: Array[Byte]): Header = {
    require(bytes.length >= 10, s"npy: file too short (${bytes.length} B)")
    require(bytes.view.slice(0, 6).sameElements(Magic),
      "npy: bad magic — not a NumPy array file")
    val major = bytes(6) & 0xff
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val (headerLen, headerStart) = major match {
      case 1 => ((buf.getShort(8) & 0xffff).toLong, 10)
      case 2 | 3 =>
        // v2+ carries a uint32 length: the magic+version check above only
        // guarantees 10 bytes — a truncated v2 stub must get the loud
        // message, not an IndexOutOfBounds from getInt
        require(bytes.length >= 12, s"npy: file too short for a v$major header (${bytes.length} B)")
        ((buf.getInt(8) & 0xffffffffL), 12)
      case v => throw new IllegalArgumentException(s"npy: unsupported major version $v")
    }
    require(headerStart + headerLen <= bytes.length,
      s"npy: header length $headerLen overruns file (${bytes.length} B)")
    val header = new String(bytes, headerStart, headerLen.toInt, StandardCharsets.ISO_8859_1)

    val descr = "'descr'\\s*:\\s*'([^']+)'".r.findFirstMatchIn(header)
      .map(_.group(1))
      .getOrElse(throw new IllegalArgumentException(s"npy: no descr in header: $header"))
    val fortran = "'fortran_order'\\s*:\\s*(True|False)".r.findFirstMatchIn(header)
      .map(_.group(1) == "True")
      .getOrElse(throw new IllegalArgumentException(s"npy: no fortran_order in header: $header"))
    val shapeStr = "'shape'\\s*:\\s*\\(([^)]*)\\)".r.findFirstMatchIn(header)
      .map(_.group(1))
      .getOrElse(throw new IllegalArgumentException(s"npy: no shape in header: $header"))
    val shape = shapeStr.split(",").map(_.trim).filter(_.nonEmpty).map(_.toLong).toSeq
    Header(descr, fortran, shape, headerStart + headerLen.toInt)
  }

  private def widthOf(descr: String): Int = descr match {
    case "<f8" => 8
    case "<f4" => 4
    case "<i8" => 8
    case "<i4" => 4
    case "<i2" => 2
    case "|i1" | "<i1" => 1
    case "|u1" | "<u1" | "|b1" => 1
    case d => throw new IllegalArgumentException(
      s"npy: unsupported dtype '$d' (little-endian numeric arrays only)")
  }

  /** Decode the payload as doubles, in storage order. */
  def doubles(bytes: Array[Byte]): Array[Double] = {
    val h = parseHeader(bytes)
    require(!h.fortranOrder || h.shape.length <= 1,
      s"npy: fortran-order multi-dim array (shape ${h.shape.mkString("x")}) — " +
        "refusing to flatten column-major data in row-major order")
    val width = widthOf(h.descr)
    val n = h.elementCount
    require(n <= Int.MaxValue, s"npy: $n elements exceed a JVM array")
    require(h.dataOffset + n * width <= bytes.length,
      s"npy: payload truncated (${bytes.length} B for $n x $width B + header ${h.dataOffset} B)")
    val buf = ByteBuffer.wrap(bytes, h.dataOffset, (n * width).toInt)
      .order(ByteOrder.LITTLE_ENDIAN)
    // dispatch once on the loop-invariant dtype, not once per element
    val decode: Int => Double = h.descr match {
      case "<f8" => i => buf.getDouble(h.dataOffset + i * 8)
      case "<f4" => i => buf.getFloat(h.dataOffset + i * 4).toDouble
      case "<i8" => i => buf.getLong(h.dataOffset + i * 8).toDouble
      case "<i4" => i => buf.getInt(h.dataOffset + i * 4).toDouble
      case "<i2" => i => buf.getShort(h.dataOffset + i * 2).toDouble
      case "|i1" | "<i1" => i => bytes(h.dataOffset + i).toDouble
      case _ => i => (bytes(h.dataOffset + i) & 0xff).toDouble // u1/b1
    }
    val out = new Array[Double](n.toInt)
    var i = 0
    while (i < out.length) {
      out(i) = decode(i)
      i += 1
    }
    out
  }

  /** Serialize doubles as a v1.0 `<f8` 1-D npy file (the round-trip
    * writer: what [[doubles]] parses, numpy.load also reads). */
  def bytes(values: Array[Double]): Array[Byte] = {
    // the whole stream must fit one JVM byte array: 8 B/value + header
    // would overflow Int arithmetic past ~268M values — refuse loudly
    // (the parser's 'exceed a JVM array' contract, write side)
    require(values.length <= (Int.MaxValue - 1024) / 8,
      s"npy: ${values.length} doubles exceed a single JVM byte array")
    val dict = s"{'descr': '<f8', 'fortran_order': False, 'shape': (${values.length},), }"
    // magic(6) + version(2) + len(2) + dict + pad + '\n', 64-aligned
    val unpadded = 10 + dict.length + 1
    val pad = (64 - unpadded % 64) % 64
    val headerStr = dict + (" " * pad) + "\n"
    val buf = ByteBuffer.allocate(10 + headerStr.length + values.length * 8)
      .order(ByteOrder.LITTLE_ENDIAN)
    buf.put(Magic).put(1.toByte).put(0.toByte)
    buf.putShort(headerStr.length.toShort)
    buf.put(headerStr.getBytes(StandardCharsets.ISO_8859_1))
    values.foreach(buf.putDouble)
    buf.array()
  }

  /** Distributed load: `.npy` file(s) → (source_file, idx, value) rows —
    * one decode task per file via the binaryFile source, values in
    * storage order with their 0-based index (the channel number for a
    * frequency reference). */
  def load(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile").load(path)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (p, content) =>
        doubles(content).iterator.zipWithIndex.map { case (v, i) => (p, i.toLong, v) }
      }
      .toDF("source_file", "idx", "value")
  }
}
