package graft

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import graft.sources.FitsFile
import graft.sources.FitsFile._

/** FITS card-header + binary-table parsing (dlyfix_fits.py:75,89,133)
  * against a hand-built PSRFITS-style fixture: primary header with typed
  * values, COMMENT/HISTORY cards and a CONTINUE long string, plus a
  * BINTABLE extension named HISTORY with two big-endian rows. */
class FitsFileSpec extends SparkSpec {

  private def card(text: String): String = text.padTo(80, ' ')
  private def kv(key: String, value: String, comment: Option[String] = None): String = {
    // Reference output format: "%s=% 22s" % (key.ljust(8), val)
    val base = key.padTo(8, ' ') + "=" + value.reverse.padTo(21, ' ').reverse
    card(comment.fold(base)(c => s"$base / $c"))
  }

  private def block(cards: Seq[String]): Array[Byte] = {
    val text = cards.mkString
    val padded = text + " " * (BlockSize - text.length % BlockSize match {
      case BlockSize => 0
      case r         => r
    })
    padded.getBytes(StandardCharsets.US_ASCII)
  }

  /** Primary header: >36 cards so the END lands in a SECOND 2880 block
    * (exercises the multi-block walk of readfitsheader). */
  private lazy val primary: Array[Byte] = {
    val filler = (1 to 30).map(i => kv(s"PAD$i", i.toString))
    block(Seq(
      kv("SIMPLE", "T", Some("conforms to FITS")),
      kv("BITPIX", "8"),
      kv("NAXIS", "0"),
      kv("OBSFREQ", "1283.582"),
      kv("SCALE", "1.0D3"),
      kv("SRC_NAME", "'J0437-4715'", Some("source / name")),
      kv("LONGSTR", "'part one &'"),
      card("CONTINUE  'part two'"),
      card("COMMENT this is a comment card"),
      card("HISTORY first history line"),
    ) ++ filler ++ Seq(card("END")))
  }

  private val rowSize = 8 + 2 + 8 // 8A + 1I + 1D
  private lazy val historyExt: Array[Byte] = {
    val hdr = block(Seq(
      kv("XTENSION", "'BINTABLE'"),
      kv("BITPIX", "8"),
      kv("NAXIS", "2"),
      kv("NAXIS1", rowSize.toString),
      kv("NAXIS2", "2"),
      kv("EXTVER", "1"),
      kv("EXTNAME", "'HISTORY '"),
      kv("TTYPE1", "'DATE_PRO'"),
      kv("TFORM1", "'8A'"),
      kv("TTYPE2", "'NPOL    '"),
      kv("TFORM2", "'1I'"),
      kv("TTYPE3", "'DM      '"),
      kv("TFORM3", "'1D'"),
      card("END")))
    val data = ByteBuffer.allocate(BlockSize)
    data.put("20200101".getBytes(StandardCharsets.US_ASCII))
      .putShort(4.toShort).putDouble(2.64476)
    data.put("20200102".getBytes(StandardCharsets.US_ASCII))
      .putShort(1.toShort).putDouble(2.64481)
    hdr ++ data.array()
  }

  private lazy val fixture: Array[Byte] = primary ++ historyExt

  test("readHeader walks multi-block headers and coerces typed values") {
    val Some((cards, next)) = readHeader(fixture, 0): @unchecked
    assert(next == 2 * BlockSize) // 40 cards + END → two blocks
    val merged = mergeContinuations(cards)
    assert(get(merged, "SIMPLE").flatMap(_.boolValue).contains(true))
    assert(get(merged, "BITPIX").flatMap(_.longValue).contains(8L))
    assert(get(merged, "OBSFREQ").flatMap(_.doubleValue).contains(1283.582))
    assert(get(merged, "SCALE").flatMap(_.doubleValue).contains(1000.0)) // Fortran D exponent
    assert(get(merged, "SRC_NAME").flatMap(_.strValue).contains("J0437-4715"))
    assert(get(merged, "SRC_NAME").flatMap(_.comment).contains("source / name"))
    assert(get(merged, "LONGSTR").flatMap(_.strValue).contains("part one part two"))
    assert(merged.exists(c => c.key == "COMMENT" && c.raw.trim == "this is a comment card"))
    assert(merged.exists(c => c.key == "HISTORY" && c.raw.trim == "first history line"))
  }

  test("slash inside a quoted string is not a comment separator") {
    val (cards, _) = parseBlock(block(Seq(
      kv("PATH", "'a/b/c   '", Some("real comment")), card("END"))), 0)
    val c = get(cards, "PATH").get
    assert(c.strValue.contains("a/b/c"))
    assert(c.comment.contains("real comment"))
  }

  test("binTableSchema + parseTable decode the HISTORY extension rows") {
    val hdus = readHdus(fixture)
    assert(hdus.map(_._1) == Seq(0, 1))
    val ext = hdus(1)._2
    assert(get(ext, "XTENSION").flatMap(_.strValue).contains("BINTABLE"))
    val schema = binTableSchema(ext).get
    assert(schema.cols.map(c => (c.name, c.code, c.repeat)) ==
      Seq(("DATE_PRO", 'A', 8), ("NPOL", 'I', 1), ("DM", 'D', 1)))
    assert(schema.rowSize == rowSize && schema.nrow == 2)
    val dataOff = fixture.length - BlockSize
    val rows = parseTable(schema, fixture, dataOff)
    assert(rows(0) == Map("DATE_PRO" -> "20200101", "NPOL" -> 4.toShort, "DM" -> 2.64476))
    assert(rows(1) == Map("DATE_PRO" -> "20200102", "NPOL" -> 1.toShort, "DM" -> 2.64481))
  }

  test("namedTable finds the extension by EXTNAME") {
    val rows = namedTable(fixture, "HISTORY")
    assert(rows.map(_("DATE_PRO")) == Seq("20200101", "20200102"))
  }

  test("extDataSize rounds data up to whole 2880 blocks") {
    val ext = readHdus(fixture)(1)._2
    assert(extDataSize(ext) == BlockSize) // 2 rows × 18 B → one padded block
  }

  // ---- write-back (fitsline.output / fitsheader.output / writerow) ----

  test("fileBytes(readHdusWithData) reproduces the archive byte-for-byte") {
    assert(fileBytes(readHdusWithData(fixture)).sameElements(fixture))
  }

  test("formatCard emits the reference fixed-format layout for new values") {
    // kv() builds exactly the reference's card layout — a fresh card must
    // land on the same bytes
    assert(formatCard(FitsCard("NPOL", fmtValue(4L), None)) == kv("NPOL", "4"))
    // with a comment the reference writes `value/ comment` (no space
    // before the slash — fitsline.output's f"{x}/ {comment}")
    assert(formatCard(FitsCard("SIMPLE", fmtValue(true), Some("conforms to FITS"))) ==
      card("SIMPLE".padTo(8, ' ') + "=" + fmtValue(true) + "/ conforms to FITS"))
    assert(formatCard(FitsCard("SRC_NAME", fmtValue("J0437-4715"), None)) ==
      kv("SRC_NAME", "'J0437-4715'"))
  }

  test("parse -> modify a card -> write -> re-parse equality (dlyfix round trip)") {
    val hdus = readHdusWithData(fixture)
    val fixed = hdus.updated(0, hdus(0).copy(cards =
      setValue(hdus(0).cards, "OBSFREQ", 1284.0, Some("delay-corrected"))))
    val re = readHdus(fileBytes(fixed))
    assert(get(re(0)._2, "OBSFREQ").flatMap(_.doubleValue).contains(1284.0))
    assert(get(re(0)._2, "OBSFREQ").flatMap(_.comment).contains("delay-corrected"))
    // every untouched card survives unchanged, both HDUs
    assert(get(re(0)._2, "SRC_NAME").flatMap(_.strValue).contains("J0437-4715"))
    assert(mergeContinuations(re(0)._2).exists(c =>
      c.key == "LONGSTR" && c.strValue.contains("part one part two")))
    assert(re(1)._2.map(c => (c.key, c.raw)) == hdus(1).cards.map(c => (c.key, c.raw)))
  }

  test("packRow inverts parseRow byte-for-byte") {
    val hdus = readHdusWithData(fixture)
    val schema = binTableSchema(hdus(1).cards).get
    val rows = parseTable(schema, hdus(1).data, 0)
    val packed = rows.toArray.flatMap(packRow(schema, _))
    assert(packed.sameElements(hdus(1).data.take(2 * schema.rowSize)))
  }

  test("appendTableRow appends a HISTORY row and bumps NAXIS2 (appendrow)") {
    val hdus = readHdusWithData(fixture)
    val appended = hdus.updated(1, hdus(1).appendTableRow(
      Map("DATE_PRO" -> "20200103", "NPOL" -> 2, "DM" -> 2.649)))
    val bytes = fileBytes(appended)
    assert(get(readHdus(bytes)(1)._2, "NAXIS2").flatMap(_.longValue).contains(3L))
    val rows = namedTable(bytes, "HISTORY")
    assert(rows.size == 3)
    assert(rows(2) == Map("DATE_PRO" -> "20200103", "NPOL" -> 2.toShort, "DM" -> 2.649))
    assert(rows.take(2).map(_("DATE_PRO")) == Seq("20200101", "20200102"))
  }

  test("transformFiles rewrites a directory of archives, executor-side") {
    val inDir = Files.createTempDirectory("fits_in").toFile
    val outDir = Files.createTempDirectory("fits_out").toFile
    try {
      Files.write(Paths.get(inDir.toString, "a.fits"), fixture)
      Files.write(Paths.get(inDir.toString, "b.fits"), fixture)
      val written = FitsFile.transformFiles(spark, inDir.toString, outDir.toString) { hdus =>
        hdus.updated(0, hdus(0).copy(cards = setValue(hdus(0).cards, "OBSFREQ", 999.5)))
          .updated(1, hdus(1).appendTableRow(
            Map("DATE_PRO" -> "20200104", "NPOL" -> 1, "DM" -> 2.65)))
      }
      assert(written == Seq("a.fits", "b.fits"))
      written.foreach { name =>
        val bytes = Files.readAllBytes(Paths.get(outDir.toString, name))
        assert(get(readHdus(bytes)(0)._2, "OBSFREQ").flatMap(_.doubleValue).contains(999.5))
        assert(namedTable(bytes, "HISTORY").size == 3)
      }
    } finally {
      Seq(inDir, outDir).foreach { d => d.listFiles().foreach(_.delete()); d.delete() }
    }
  }

  test("transformFiles writes through the Hadoop FileSystem API (file: URI)") {
    val inDir = Files.createTempDirectory("fits_in_uri").toFile
    val outDir = Files.createTempDirectory("fits_out_uri").toFile
    try {
      Files.write(Paths.get(inDir.toString, "c.fits"), fixture)
      // an explicit scheme must resolve via Hadoop FileSystem, and the
      // identity transform must round-trip the archive bit-exactly
      val written =
        FitsFile.transformFiles(spark, inDir.toString, "file:" + outDir)(identity)
      assert(written == Seq("c.fits"))
      val bytes = Files.readAllBytes(Paths.get(outDir.toString, "c.fits"))
      assert(bytes.sameElements(fixture))
    } finally {
      Seq(inDir, outDir).foreach { d => d.listFiles().foreach(_.delete()); d.delete() }
    }
  }

  test("parseCard: per-card grammar (the path parseBlock walks)") {
    // value card with quote-aware '/' split and '' escape
    val c = parseCard(card("SRC_NAME= 'J3-07''A/B  ' / target")).get
    assert(c.key == "SRC_NAME" && c.strValue.contains("J3-07'A/B") &&
      c.comment.contains("target"))
    // logical, int (signed), float with d exponent
    assert(parseCard(card("SIMPLE  = T")).get.boolValue.contains(true))
    assert(parseCard(card("TINT    = +42 / s")).get.longValue.contains(42L))
    assert(parseCard(card("DM      = -7.5d-2")).get.doubleValue.contains(-0.075))
    // COMMENT keeps the remainder raw, no comment split
    val cm = parseCard(card("COMMENT free / text")).get
    assert(cm.key == "COMMENT" && cm.raw.trim == "free / text" && cm.comment.isEmpty)
    // END, blank padding, BAD LINE
    assert(parseCard(card("END")).get.key == "END")
    assert(parseCard(" " * 80).isEmpty)
    assert(parseCard(card("BADCARD no equals")).isEmpty)
    // short input is blank-padded (parseBlock always hands exactly 80)
    assert(parseCard("NCHAN   = 1024").get.longValue.contains(1024L))
  }

  test("parseCardColumn: typing + CONTINUE merge through the production path") {
    import spark.implicits._
    val rows = Seq(
      (1L, card("SCALE   = 12.25 / gain")),
      (2L, card("OBSERVER= 'team-1 &' / obs") + "\n" +
        card("CONTINUE  'alpha &'") + "\n" + card("CONTINUE  'omega'")),
      (3L, card("BADCARD no equals")),        // skipped
      (4L, card("BLANKVAL=")),                // undefined value
    ).toDF("id", "t")
    val out = FitsFile.parseCardColumn(rows, "id", "t")
      .select("card_id", "key", "value_type", "str_value", "comment")
      .as[(Long, String, String, Option[String], Option[String])].collect().toSet
    assert(out == Set(
      (1L, "SCALE", "float", None, Some("gain")),
      (2L, "OBSERVER", "str", Some("team-1 alpha omega"), Some("obs")),
      (4L, "BLANKVAL", "undef", None, None),
    ))
  }

  test("distributed load explodes cards over binaryFile") {
    import spark.implicits._
    val dir = Files.createTempDirectory("fits").toFile
    try {
      Files.write(Paths.get(dir.toString, "a.fits"), fixture)
      Files.write(Paths.get(dir.toString, "b.fits"), primary)
      val df = FitsFile.load(spark, dir.toString).cache()
      assert(df.where($"key" === "SRC_NAME").count() == 2)
      // only a.fits has the extension HDU
      val dm = df.where($"hdu" === 1 && $"key" === "NAXIS2").select("long_value")
        .as[Option[Long]].collect().toSeq
      assert(dm == Seq(Some(2L)))
      // typed columns survive the explode
      val freq = df.where($"key" === "OBSFREQ").select("double_value")
        .as[Option[Double]].collect().toSeq
      assert(freq == Seq(Some(1283.582), Some(1283.582)))
      df.unpersist()
    } finally {
      dir.listFiles().foreach(_.delete()); dir.delete(); ()
    }
  }
}
