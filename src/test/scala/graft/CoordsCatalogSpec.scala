package graft

import org.apache.spark.sql.functions._

import graft.functions.Coords
import graft.sources.Catalogs

class CoordsCatalogSpec extends SparkSpec {
  import spark.implicits._

  test("equatorial→galactic rotation matches pulsar-catalogue values (get_glgb analog)") {
    // Published psrcat coordinates: Vela (J0835-4510) GL=263.55 GB=-2.79;
    // Crab (J0534+2200) GL=184.56 GB=-5.78; Sgr A* ~ (359.94, -0.05).
    val df = Seq(
      ("vela", 128.83588, -45.17635, 263.5518, -2.7873),
      ("crab", 83.63308, 22.01450, 184.5575, -5.7844),
      ("sgrA", 266.41684, -29.00781, 359.9443, -0.0462),
    ).toDF("n", "ra", "dec", "wantGl", "wantGb")
    val rows = df.select(col("n"),
      Coords.glDeg(col("ra"), col("dec")).as("gl"),
      Coords.gbDeg(col("ra"), col("dec")).as("gb"),
      col("wantGl"), col("wantGb"))
      .as[(String, Double, Double, Double, Double)].collect()
    rows.foreach { case (n, gl, gb, wantGl, wantGb) =>
      assert(math.abs(gl - wantGl) < 0.001, s"$n gl=$gl")
      assert(math.abs(gb - wantGb) < 0.001, s"$n gb=$gb")
    }
    // north galactic pole maps to gb = 90 exactly
    val ngp = Seq((Coords.RaNgpDeg, Coords.DecNgpDeg)).toDF("ra", "dec")
      .select(Coords.gbDeg(col("ra"), col("dec"))).as[Double].head()
    assert(math.abs(ngp - 90.0) < 1e-9)
  }

  test("sexagesimal RAJ/DECJ parsing matches astropy hourangle/deg semantics") {
    val df = Seq(
      ("08:35:20.61149", "-45:10:34.8751"), // Vela par-file style
      ("05:34:31.973", "+22:00:52.06"),     // Crab
      ("12:00", "-00:30:00"),               // sub-degree negative, short RA
    ).toDF("raj", "decj")
    val got = df.select(
      Coords.raFromHms(col("raj")).as("ra"),
      Coords.decFromDms(col("decj")).as("dec")).as[(Double, Double)].collect()
    assert(math.abs(got(0)._1 - 128.83588) < 1e-4)
    assert(math.abs(got(0)._2 - (-45.17635)) < 1e-4)
    assert(math.abs(got(1)._1 - 83.63322) < 1e-4)
    assert(math.abs(got(1)._2 - 22.01446) < 1e-4)
    assert(got(2)._1 == 180.0)
    assert(got(2)._2 == -0.5) // sign applies to the whole value, not just degrees
  }

  test("UHF Tsky catalogue: recall, default fallback and Jy conversion (fluxcal_meerkat.py:231)") {
    // UHF_Tsky.dat format: 'JNAME value' lines, # comments
    val catText =
      """# per-pulsar UHF sky temperatures (K)
        |J0001+0001 9.3
        |J0002-0002 7.2
        |""".stripMargin
    val cat = Catalogs.fromText(spark, catText)
    val obs = Seq("J0001+0001", "J0002-0002", "J9999-9999").toDF("psr")
    val out = Catalogs.withTskyUhf(obs, "psr", cat)
      .select("psr", "tsky_k", "tsky_jy").as[(String, Double, Double)].collect()
      .map { case (k, v, j) => k -> ((v, j)) }.toMap
    assert(out("J0001+0001") == ((9.3, 9.3 * 19.0)))
    assert(out("J0002-0002") == ((7.2, 7.2 * 19.0)))
    assert(out("J9999-9999") == ((5.5, 5.5 * 19.0))) // default cold sky
  }

  test("catalogue joins don't clobber an obs column named 'name'") {
    val cat = Catalogs.fromText(spark, "J0001+0001 9.3\n")
    val obs = Seq(("J0001+0001", "obsA")).toDF("psr", "name")
    val out = Catalogs.withTskyUhf(obs, "psr", cat)
    assert(out.columns.contains("name"))
    assert(out.select("name").as[String].head() == "obsA")
  }

  test("position catalogue: name resolution, par fallback, provenance (get_radec analog)") {
    val cat = Catalogs.positionsFromText(spark,
      """# psrcat dump
        |J0835-4510 128.8360 -45.1764
        |J0437-4715 69.3161 -47.2525""".stripMargin)
    assert(cat.count() === 2)
    val obs = Seq(
      ("J0835-4510", Some(1.0), Some(2.0)),  // catalogued: catalog wins
      ("J9999+0000", Some(33.25), Some(-7.5)), // uncatalogued: par route
      ("J0000-0000", Option.empty[Double], Option.empty[Double]), // neither
    ).toDF("psr", "ra_par", "dec_par")
    val out = Catalogs.withRaDec(obs, "psr", cat, col("ra_par"), col("dec_par"))
      .select("psr", "ra_deg", "dec_deg", "pos_source")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("J0835-4510").getDouble(1) === 128.8360 &&
      out("J0835-4510").getString(3) === "catalog")
    assert(out("J9999+0000").getDouble(1) === 33.25 &&
      out("J9999+0000").getDouble(2) === -7.5 &&
      out("J9999+0000").getString(3) === "par")
    assert(out("J0000-0000").isNullAt(1) && out("J0000-0000").isNullAt(3))
    // HALF-parsed par fallback (ra without dec): the pair resolves
    // together or not at all — no single real coordinate may leak under
    // a null pos_source (found in review)
    val half = Seq(("J1111+1111", Some(12.5), Option.empty[Double]))
      .toDF("psr", "ra_par", "dec_par")
    val h = Catalogs.withRaDec(half, "psr", cat, col("ra_par"), col("dec_par")).head()
    assert(h.isNullAt(h.fieldIndex("ra_deg")) && h.isNullAt(h.fieldIndex("dec_deg"))
      && h.isNullAt(h.fieldIndex("pos_source")))
    // HALF-NULL catalogue row (rajd set, decjd null — possible when the
    // caller built the catalog frame elsewhere; positionsFromText can't
    // produce one): the catalogue route must resolve as a PAIR too — no
    // mixing catalogue ra with par dec under pos_source='catalog'
    // (advisor finding, round 11)
    val halfCat = Seq(("J2222+2222", Some(200.0), Option.empty[Double]))
      .toDF("name", "rajd", "decjd")
    val hc = Catalogs.withRaDec(
      Seq(("J2222+2222", 10.0, -20.0)).toDF("psr", "ra_par", "dec_par"),
      "psr", halfCat, col("ra_par"), col("dec_par")).head()
    assert(hc.getDouble(hc.fieldIndex("ra_deg")) === 10.0 &&
      hc.getDouble(hc.fieldIndex("dec_deg")) === -20.0 &&
      hc.getString(hc.fieldIndex("pos_source")) === "par",
      "a partially-null catalogue row must fall through to the par PAIR")
    // malformed catalogue lines fail loudly, not as silent drops
    intercept[IllegalArgumentException] {
      Catalogs.positionsFromText(spark, "J0835-4510 128.8")
    }
  }

  test("RM catalogue joins as a broadcast dim with zero default") {
    val cat = Catalogs.fromText(spark, "J0001+0001 18.4888\n")
    val obs = Seq("J0001+0001", "J9999-9999").toDF("psr")
    val joined = Catalogs.withRm(obs, "psr", cat)
    val plan = joined.queryExecution.sparkPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"),
      s"catalogue dim should broadcast:\n$plan")
    val out = joined.select("psr", "rm").as[(String, Double)].collect().toMap
    assert(out("J0001+0001") == 18.4888)
    assert(out("J9999-9999") == 0.0)
  }

  test("galactic coords feed the Tsky grid lookup as pure column math") {
    // end-to-end: RA/DEC strings → gl/gb → grid pixel lookup
    val ax1 = graft.operators.GridLookup.Axis(crval = 0.0, crpix = 0.0, cdelt = 1.0, n = 360)
    val ax2 = graft.operators.GridLookup.Axis(crval = 0.0, crpix = 90.0, cdelt = 1.0, n = 181)
    val grid = Seq((264, 87, 3900.0)).toDF("pix1", "pix2", "v") // (gl≈263.55, gb≈-2.79+90)
    val obs = Seq(("08:35:20.61149", "-45:10:34.8751")).toDF("raj", "decj")
      .withColumn("ra", Coords.raFromHms(col("raj")))
      .withColumn("dec", Coords.decFromDms(col("decj")))
      .withColumn("gl", Coords.glDeg(col("ra"), col("dec")))
      .withColumn("gb", Coords.gbDeg(col("ra"), col("dec")))
    val out = graft.operators.GridLookup.nearest(obs, grid, col("gl"), col("gb"),
      ax1, ax2, "v", default = 3400.0)
    assert(out.select("looked_up").as[Double].head() == 3900.0)
  }

  test("GridLookup.bilinear interpolates between four corners and degrades to default") {
    import graft.operators.GridLookup
    import org.apache.spark.sql.functions._
    val ax = GridLookup.Axis(crval = 0.0, crpix = 0.0, cdelt = 1.0, n = 10)
    // grid values = 10*p1 + p2 (a plane — bilinear must reproduce it exactly)
    val grid = (for { p1 <- 0 to 5; p2 <- 0 to 5 } yield (p1, p2, 10.0 * p1 + p2))
      .toDF("pix1", "pix2", "v")
    val pts = Seq(
      (1L, 2.0, 3.0),    // exactly on a cell: value 23
      (2L, 2.5, 3.0),    // halfway in x: (23 + 33)/2 = 28
      (3L, 2.25, 3.75),  // general point: plane -> 10*2.25 + 3.75 = 26.25
      (4L, 100.0, 100.0), // far outside: all corners default (-7)
    ).toDF("id", "x", "y")
    val out = GridLookup.bilinear(pts, grid, col("x"), col("y"),
        ax, ax, "v", default = -7.0)
      .select("id", "looked_up_bilinear").as[(Long, Double)].collect().toMap
    assert(math.abs(out(1L) - 23.0) < 1e-12)
    assert(math.abs(out(2L) - 28.0) < 1e-12)
    assert(math.abs(out(3L) - 26.25) < 1e-12)
    assert(math.abs(out(4L) - -7.0) < 1e-12)
    // null coordinate → default (matches nearest's degradation), not null
    val nullPt = Seq((9L, Option.empty[Double], Option(3.0))).toDF("id", "x", "y")
    val nv = GridLookup.bilinear(nullPt, grid, col("x"), col("y"),
        ax, ax, "v", default = -7.0)
      .select("looked_up_bilinear").as[Double].head()
    assert(nv === -7.0)
    // agreement with nearest at exact cell centers
    val near = GridLookup.nearest(pts.filter($"id" === 1L), grid, col("x"), col("y"),
        ax, ax, "v", default = -7.0)
      .select("looked_up").as[Double].head()
    assert(near === 23.0)
  }
}
