package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.TrimEdges
import graft.sources.DynspecFile

class DynspecSpec extends SparkSpec {
  import spark.implicits._

  test("DynspecFile.load parses the psrflux text format and flags zapped cells") {
    val text =
      """# MJD0= 58000.1
        |# header line
        |0 0 0.0 1283.0 1.5 0.1
        |0 1 0.0 1284.0 0.0 0.0
        |1 0 8.0 1283.0 2.5 0.2
        |1 1 8.0 1284.0 0.0 0.0
        |""".stripMargin
    val dir = Files.createTempDirectory("dyn")
    Files.writeString(dir.resolve("test.dynspec"), text)
    val df = DynspecFile.load(spark, dir.resolve("test.dynspec").toString)
    assert(df.count() == 4)
    assert(df.filter(col("zapped")).count() == 2)
    assert(DynspecFile.zapFraction(df) == 0.5) // archive_utils.py:118 semantics
  }

  test("DynspecFile.parseColumn: per-line quirks (short lines, indented comments, extra tokens, null ids)") {
    val rows = Seq(
      (1L, "0 5 0.0 1283.5 1.5 0.1"),          // plain cell
      (10L, "3.0 11.0 8.0 1284.5 2.5 0.1"),    // float-formatted indices (np.savetxt round-trip)
      (2L, "  # indented comment"),             // drops (trim before # test)
      (3L, ""),                                 // blank drops
      (4L, "1 2 3.0 4.0 5.0"),                  // 5 tokens -> drops
      (5L, "0 6 0.0 1284.5 0.0 0.0 99 extra"),  // extra tokens ignored, zapped
      (6L, "0 7 0.0 1285.5 0.0 2.5"),           // flux 0 but err nonzero -> NOT zapped
      (7L, null),                               // null line drops
      (11L, "0 8 0.0 1286.5 0.0 0.0 # zapped, trailing comment"), // np.loadtxt truncates at # ANYWHERE
      (12L, "0 9 0.0 1286.5 1.5 # comment lands before col 6"),   // truncation leaves 5 tokens -> drops
    ).toDF("id", "l")
    val out = DynspecFile.parseColumn(rows, "id", "l")
      .select("cell_id", "chan_idx", "zapped").as[(Long, Int, Boolean)].collect().toSet
    assert(out == Set((1L, 5, false), (10L, 11, false), (5L, 6, true), (6L, 7, false), (11L, 8, true)))
    // a null id drops its line even when the line itself parses
    val nullId = Seq((java.lang.Long.valueOf(8L), "0 5 0.0 1283.5 1.5 0.1"),
      (null.asInstanceOf[java.lang.Long], "0 9 0.0 1283.5 1.5 0.1")).toDF("id", "l")
    assert(DynspecFile.parseColumn(nullId, "id", "l").count() == 1)
    // malformed numeric tokens THROW (np.loadtxt raises on garbage too)
    val bad = Seq((9L, "zero 5 0.0 1283.5 1.5 0.1")).toDF("id", "l")
    intercept[org.apache.spark.SparkException] {
      DynspecFile.parseColumn(bad, "id", "l").collect()
    }
    ()
  }

  test("HeaderFile.parseColumn: last-wins duplicates, key-only lines, first-whitespace-run split") {
    import graft.sources.HeaderFile
    val hdr = Seq(
      (1L, "SOURCE J1\nBW   856\nSOURCE J2\nKEYONLY\n  TIED 1 2 coherent\n# c\n\n  # ic"),
      (2L, null),
    ).toDF("id", "t")
    val out = HeaderFile.parseColumn(hdr, "id", "t")
      .select("hdr_id", "key", "value").as[(Long, String, String)].collect().toSet
    assert(out == Set(
      (1L, "SOURCE", "J2"),       // LAST occurrence wins (the dict build)
      (1L, "BW", "856"),          // multi-space separator collapses
      (1L, "TIED", "1 2 coherent"), // split at FIRST whitespace run only
    ))
  }

  test("TrimEdges drops all-zapped border rows/channels") {
    // grid 4x4; valid cells only in [1..2] x [1..2]
    val cells = for { t <- 0 to 3; c <- 0 to 3 } yield
      (t, c, if (t >= 1 && t <= 2 && c >= 1 && c <= 2) 1.0 else 0.0)
    val df = cells.toDF("t", "c", "flux")
    val out = TrimEdges(df, "t", "c", col("flux") =!= 0.0)
    assert(out.count() == 4) // 2x2 box remains
    assert(out.agg(min("t"), max("t"), min("c"), max("c")).as[(Int, Int, Int, Int)].head() == (1, 2, 1, 2))
  }
}
