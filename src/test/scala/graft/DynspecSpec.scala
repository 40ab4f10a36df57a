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
