package graft

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets
import java.nio.file.Files

import graft.sources.NpyFile

/** NumPy `.npy` source: header grammar (v1 uint16 / v2 uint32 lengths,
  * literal dict, 64-byte padding), dtype decode matrix, the writer
  * round-trip, and the distributed binaryFile load path. */
class NpySpec extends SparkSpec {

  private val grid928: Array[Double] =
    Array.tabulate(928)(i => 896.125 + i * 0.8359375)

  /** Hand-assemble an npy byte stream from an explicit dict string —
    * the stored header length always matches the dict, so malformed-DICT
    * cases (not malformed-LENGTH cases) are what each test plants. */
  private def assemble(dict: String, major: Int, payload: Array[Byte]): Array[Byte] = {
    val headerStart = if (major == 1) 10 else 12
    val buf = ByteBuffer.allocate(headerStart + dict.length + payload.length)
      .order(ByteOrder.LITTLE_ENDIAN)
    buf.put(0x93.toByte).put("NUMPY".getBytes(StandardCharsets.US_ASCII))
    buf.put(major.toByte).put(0.toByte)
    if (major == 1) buf.putShort(dict.length.toShort) else buf.putInt(dict.length)
    buf.put(dict.getBytes(StandardCharsets.ISO_8859_1))
    buf.put(payload)
    buf.array()
  }

  private def le(width: Int, n: Int)(put: (ByteBuffer, Int) => Unit): Array[Byte] = {
    val buf = ByteBuffer.allocate(n * width).order(ByteOrder.LITTLE_ENDIAN)
    (0 until n).foreach(i => put(buf, i))
    buf.array()
  }

  private def dictFor(descr: String, shape: String, fortran: Boolean = false): String =
    s"{'descr': '$descr', 'fortran_order': ${if (fortran) "True" else "False"}, " +
      s"'shape': $shape, }\n"

  test("writer round-trips through the parser bitwise") {
    val b = NpyFile.bytes(grid928)
    val h = NpyFile.parseHeader(b)
    assert(h.descr === "<f8")
    assert(!h.fortranOrder)
    assert(h.shape === Seq(928L))
    // NEP-1 alignment contract: data starts 64-aligned, header ends \n
    assert(h.dataOffset % 64 === 0)
    assert(b(h.dataOffset - 1) === '\n'.toByte)
    assert(NpyFile.doubles(b).sameElements(grid928))
  }

  test("writer output carries the header grammar numpy itself writes") {
    // the reference 928ch file's exact header shape (observed bytes):
    // \x93NUMPY \x01 \x00 len<u2> {'descr': '<f8', 'fortran_order':
    // False, 'shape': (928,), } padded to 64
    val b = NpyFile.bytes(grid928)
    assert(b(0) === 0x93.toByte)
    assert(new String(b, 1, 5, StandardCharsets.US_ASCII) === "NUMPY")
    assert(b(6) === 1.toByte && b(7) === 0.toByte)
    val dict = new String(b, 10, (b(8) & 0xff) | ((b(9) & 0xff) << 8),
      StandardCharsets.ISO_8859_1)
    assert(dict.contains("'descr': '<f8'"))
    assert(dict.contains("'fortran_order': False"))
    assert(dict.contains("'shape': (928,)"))
  }

  test("dtype decode matrix: f4, i8, i4, i2, i1, u1") {
    def arr(descr: String, shapeN: Int, payload: Array[Byte]) =
      NpyFile.doubles(assemble(dictFor(descr, s"($shapeN,)"), 1, payload))
    assert(arr("<f4", 5, le(4, 5)((b, i) => b.putFloat(i * 1.5f)))
      === Array(0.0, 1.5, 3.0, 4.5, 6.0))
    assert(arr("<i8", 4, le(8, 4)((b, i) => b.putLong(-i * 10L)))
      === Array(0.0, -10.0, -20.0, -30.0))
    assert(arr("<i4", 5, le(4, 5)((b, i) => b.putInt(i - 2)))
      === Array(-2.0, -1.0, 0.0, 1.0, 2.0))
    assert(arr("<i2", 3, le(2, 3)((b, i) => b.putShort((i * 300).toShort)))
      === Array(0.0, 300.0, 600.0))
    assert(arr("|i1", 3, le(1, 3)((b, i) => b.put((i - 1).toByte)))
      === Array(-1.0, 0.0, 1.0))
    // u1 reads unsigned: byte 0xFF is 255, not -1
    assert(arr("|u1", 2, le(1, 2)((b, _) => b.put(0xff.toByte)))
      === Array(255.0, 255.0))
  }

  test("v2 header (uint32 length) parses") {
    val b = assemble(dictFor("<f8", "(6,)"), 2, le(8, 6)((buf, i) => buf.putDouble(i * 0.25)))
    val h = NpyFile.parseHeader(b)
    assert(h.descr === "<f8" && h.shape === Seq(6L))
    assert(NpyFile.doubles(b) === Array.tabulate(6)(_ * 0.25))
  }

  test("bad magic, unsupported dtype, fortran multi-dim, truncation all refuse loudly") {
    val good = NpyFile.bytes(Array(1.0, 2.0))
    val badMagic = good.clone(); badMagic(0) = 'P'.toByte
    assert(intercept[IllegalArgumentException](NpyFile.parseHeader(badMagic))
      .getMessage.contains("magic"))
    val objDtype = assemble(dictFor("|O8", "(2,)"), 1, new Array[Byte](16))
    assert(intercept[IllegalArgumentException](NpyFile.doubles(objDtype))
      .getMessage.contains("unsupported dtype"))
    val fortran2d = assemble(dictFor("<f8", "(2, 3)", fortran = true), 1,
      le(8, 6)((b, i) => b.putDouble(i)))
    assert(intercept[IllegalArgumentException](NpyFile.doubles(fortran2d))
      .getMessage.contains("fortran"))
    assert(intercept[IllegalArgumentException](NpyFile.doubles(good.take(good.length - 4)))
      .getMessage.contains("truncated"))
  }

  test("C-order 2-D flattens row-major with shape carried in the header") {
    val b2d = assemble(dictFor("<f8", "(2, 3)"), 1, le(8, 6)((b, i) => b.putDouble(i)))
    assert(NpyFile.parseHeader(b2d).shape === Seq(2L, 3L))
    assert(NpyFile.doubles(b2d) === Array(0.0, 1.0, 2.0, 3.0, 4.0, 5.0))
    // fortran 1-D is fine — storage order IS logical order
    val f1d = assemble(dictFor("<f8", "(3,)", fortran = true), 1,
      le(8, 3)((b, i) => b.putDouble(i * 2.0)))
    assert(NpyFile.doubles(f1d) === Array(0.0, 2.0, 4.0))
  }

  test("load(): binaryFile-distributed decode of written npy files") {
    val dir = Files.createTempDirectory("npy").toFile
    try {
      Files.write(new java.io.File(dir, "chans.npy").toPath, NpyFile.bytes(grid928))
      Files.write(new java.io.File(dir, "weights.npy").toPath,
        NpyFile.bytes(Array(1.0, 0.5, 0.25)))
      val rows = NpyFile.load(spark, dir.getAbsolutePath + "/*.npy")
        .collect()
        .map(r => (r.getString(0).split('/').last, r.getLong(1), r.getDouble(2)))
      assert(rows.length === 931)
      val chans = rows.filter(_._1 == "chans.npy").sortBy(_._2)
      assert(chans.length === 928)
      assert(chans.head._3 === 896.125)
      assert(chans.last._3 === 1671.0390625)
      assert(chans.map(_._3).sameElements(grid928))
      assert(rows.filter(_._1 == "weights.npy").sortBy(_._2).map(_._3).toSeq
        === Seq(1.0, 0.5, 0.25))
    } finally {
      dir.listFiles().foreach(_.delete()); dir.delete()
    }
  }
}
