package graft

import java.nio.charset.StandardCharsets
import java.nio.file.Files

import graft.sources.ResidualFile

/** tempo2 general2 `.residual` interchange: line grammar, banner/noise
  * leniency, flags passthrough, and the distributed load path. */
class ResidualFileSpec extends SparkSpec {

  test("parseLine: five numerics then verbatim flags") {
    val r = ResidualFile.parseLine(
      "59000.123456 -1.5e-06 250.5 1283.582 -0.00042 -B LBAND -be MKBF -snr 42").get
    assert(r.bat === 59000.123456)
    assert(r.post === -1.5e-6)
    assert(r.err === 250.5)
    assert(r.freq === 1283.582)
    assert(r.postPhase === -0.00042)
    assert(r.flags === "-B LBAND -be MKBF -snr 42")
  }

  test("flags are optional; whitespace runs collapse; noise lines skip") {
    val bare = ResidualFile.parseLine("59000 1e-7 100 1284 0.001").get
    assert(bare.flags === "")
    val padded = ResidualFile.parseLine("  59000   1e-7  100  1284  0.001   -B UHF ").get
    assert(padded.flags === "-B UHF")
    assert(ResidualFile.parseLine("").isEmpty)
    assert(ResidualFile.parseLine("# comment").isEmpty)
    assert(ResidualFile.parseLine("Generating residuals").isEmpty)
    assert(ResidualFile.parseLine("----------------------------------").isEmpty)
    assert(ResidualFile.parseLine("59000 1e-7 100").isEmpty, "too few numerics")
    assert(ResidualFile.parseLine("59000 abc 100 1284 0.001").isEmpty,
      "non-numeric in a numeric slot")
  }

  test("parse: a whole general2 emission with banner noise") {
    val text =
      """Generating residuals
        |----------------------------------
        |59000.5 1.0e-06 300 1283.0 0.0001 -B LBAND
        |59001.5 -2.0e-06 200 1450.0 -0.0002 -B LBAND
        |""".stripMargin
    val rs = ResidualFile.parse(text)
    assert(rs.length === 2)
    assert(rs.map(_.bat) === Seq(59000.5, 59001.5))
  }

  test("load(): distributed typed rows with source_file separation") {
    val dir = Files.createTempDirectory("resid").toFile
    try {
      Files.write(new java.io.File(dir, "a.residual").toPath,
        "59000 1e-7 100 1284 0.001 -B LBAND\n59001 2e-7 90 1290 0.002 -B LBAND\n"
          .getBytes(StandardCharsets.UTF_8))
      Files.write(new java.io.File(dir, "b.residual").toPath,
        "noise line\n58000 3e-7 80 900 0.003 -B UHF\n".getBytes(StandardCharsets.UTF_8))
      val rows = ResidualFile.load(spark, dir.getAbsolutePath + "/*.residual")
        .collect()
        .map(r => (r.getString(0).split('/').last, r.getDouble(1), r.getString(6)))
      assert(rows.length === 3)
      assert(rows.count(_._1 == "a.residual") === 2)
      assert(rows.filter(_._1 == "b.residual").map(x => (x._2, x._3)).toSeq
        === Seq((58000.0, "-B UHF")))
    } finally {
      dir.listFiles().foreach(_.delete()); dir.delete()
    }
  }
}
