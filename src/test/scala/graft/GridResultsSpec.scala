package graft

import org.apache.spark.sql.functions._

import graft.operators.{GridLookup, Results}
import graft.sources.HeaderFile

class GridResultsSpec extends SparkSpec {
  import spark.implicits._

  test("GridLookup.nearest quantizes like the reference pixel math (fluxcal_meerkat.py:186)") {
    // axis: world = 0 + (pix - 0) * 1.0, 10 pixels
    val ax = GridLookup.Axis(crval = 0.0, crpix = 0.0, cdelt = 1.0, n = 10)
    val grid = Seq((2, 3, 42.0), (5, 5, 7.0)).toDF("pix1", "pix2", "v")
    val pts = Seq(
      (1L, 2.4, 3.4),    // rounds to (2,3) → 42
      (2L, 1.6, 2.6),    // rounds to (2,3) → 42
      (3L, 5.0, 5.0),    // exact (5,5) → 7
      (4L, 4.0, 4.0),    // in range but no grid cell → default
      (5L, -3.0, 2.0),   // out of range → default
      (6L, 11.0, 2.0),   // pix 11 > naxis → default (reference bound is `> n`)
      (7L, -0.7, 3.0),   // pix+0.5 = -0.2: python int() truncates to 0, not -1
    ).toDF("id", "x", "y")
    val grid2 = grid.union(Seq((0, 3, 9.0)).toDF("pix1", "pix2", "v"))
    val out = GridLookup.nearest(pts, grid2, col("x"), col("y"), ax, ax, "v", default = 3.4)
      .select("id", "looked_up").as[(Long, Double)].collect().toMap
    assert(out == Map(1L -> 42.0, 2L -> 42.0, 3L -> 7.0, 4L -> 3.4, 5L -> 3.4,
      6L -> 3.4, 7L -> 9.0))
  }

  test("HeaderFile.parse reads KEY VALUE headers (fluxcal_meerkat.py:20)") {
    val text =
      """FREQ  1283.58
        |BW    856.0
        |ANTENNAE m000,m001,m002
        |# comment
        |BADLINE
        |""".stripMargin
    val m = HeaderFile.parse(text)
    assert(m == Map("FREQ" -> "1283.58", "BW" -> "856.0", "ANTENNAE" -> "m000,m001,m002"))
    assert(m("ANTENNAE").split(",").length == 3) // nant extraction path
  }

  test("Results.assemble pivots metrics into one record with JSON (generate_images_results.py:256)") {
    val metrics = Seq(
      ("obsA", "sn", 42.5), ("obsA", "flux", 1.2), ("obsA", "percent_rfi_zapped", 0.07),
      ("obsB", "sn", 13.0),
    ).toDF("obs", "metric", "value")
    val out = Results.assemble(metrics, "obs", "metric", "value",
      Seq("percent_rfi_zapped", "sn", "flux"))
    val rows = out.collect().map(r => r.getAs[String]("obs") -> r.getAs[String]("results_json")).toMap
    assert(rows("obsA").contains("\"sn\":42.5"))
    assert(rows("obsA").contains("\"percent_rfi_zapped\":0.07"))
    assert(rows("obsB").contains("\"flux\":null")) // reference writes nulls for raw-only runs
  }

  test("catalog smoke: every query builds and executes at sf0.001") {
    val failures = graft.queries.Queries.all.flatMap { q =>
      try { q.build(spark, "/root/testdata/sf0.001").count(); None }
      catch { case e: Throwable => Some(q.name -> e.getMessage) }
    }
    assert(failures.isEmpty, failures.mkString("; "))
  }
}
