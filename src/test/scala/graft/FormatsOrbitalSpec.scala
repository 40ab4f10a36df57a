package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.expressions.{KeplerMath, KeplerSolve}
import graft.functions.Orbital
import graft.sources.Formats

class FormatsOrbitalSpec extends SparkSpec {
  import spark.implicits._

  test("CSV and JSON round-trip preserves values under explicit schema") {
    val df = Seq((1L, "a", 1.5), (2L, "b", -2.25)).toDF("id", "name", "v")
    val dir = Files.createTempDirectory("fmt").toString
    Formats.writeCsv(df, s"$dir/csv")
    Formats.writeJson(df, s"$dir/json")
    val backCsv = Formats.readCsv(spark, s"$dir/csv", df.schema).as[(Long, String, Double)].collect().toSet
    val backJson = Formats.readJson(spark, s"$dir/json", df.schema).as[(Long, String, Double)].collect().toSet
    assert(backCsv == Set((1L, "a", 1.5), (2L, "b", -2.25)))
    assert(backJson == backCsv)
  }

  test("writePartitionedParquet produces hive-partitioned layout") {
    val df = Seq((1L, "x"), (2L, "y"), (3L, "x")).toDF("id", "part")
    val dir = Files.createTempDirectory("pq").toString + "/out"
    Formats.writePartitionedParquet(df, dir, Seq("part"))
    val back = spark.read.parquet(dir)
    assert(back.count() == 3)
    assert(new java.io.File(dir).listFiles().exists(_.getName.startsWith("part=")))
  }

  test("Orbital.binPhase column matches the scalar reference path (binary_tools.py:76)") {
    KeplerSolve.register(spark)
    val pars = Orbital.BinaryPars(pbDays = 0.32, t0Mjd = 60300.0, ecc = 0.4,
      om0Rad = 1.1, omdotDegPerYear = 3.0, pbdot = 1e-9)
    val tss = Seq("2024-01-03 04:00:00", "2024-01-11 23:11:07", "2024-01-29 17:45:59")
      .map(java.sql.Timestamp.valueOf)
    val got = tss.toDF("ts")
      .withColumn("phase", Orbital.binPhase(col("ts"), pars))
      .select("phase").as[Double].collect()

    val omb = 2.0 * math.Pi / pars.pbDays
    val omdotRadPerDay = pars.omdotDegPerYear * (math.Pi / 180.0) / 365.25
    val want = tss.map { ts =>
      val mjd = ts.getTime / 86400000.0 + 40587.0
      val dt = mjd - pars.t0Mjd
      val m = omb * (dt - 0.5 * pars.pbdot / pars.pbDays * dt * dt)
      KeplerMath.binPhase(m, pars.ecc, pars.om0Rad, omdotRadPerDay, omb)
    }
    got.zip(want).foreach { case (g, w) =>
      assert(math.abs(g - w) < 1e-9, s"got=$g want=$w")
      assert(g >= 0.0 && g < 1.0)
    }
  }
}
