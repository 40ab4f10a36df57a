package graft

import java.io.ByteArrayInputStream
import javax.imageio.ImageIO

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{DelayCorrection, Downsample, FluxCal, GridLookup, Raster, Results, TimingFit, Toa, ToaSelect}
import graft.sources.{Catalogs, FitsFile}
import graft.sources.FitsFile.{BinColumn, BinTableSchema, FitsCard, Hdu}

/** End-to-end composition of the reference's per-observation pipeline
  * (generate_images_results.py:302 `main`, run after dlyfix + fluxcal +
  * decimation; README Functionalities §1–§6) as ONE chain over fabricated
  * archives:
  *
  *   FITS source (graft-fits + SUBINT binary table) → delay correction
  *   (dlyfix) → flux calibration (fluxcal_meerkat) → decimation products
  *   (pam loops) → TOA estimation (pat) → TOA selection (.select logic)
  *   → timing fit + residuals (tempo2) → results JSON + dynspec PNG.
  *
  * Every stage consumes the previous stage's DataFrame — the point is the
  * HANDOFFS: q133/q138 proved composition bugs hide between
  * individually-green stages. Everything is planted with exactly-
  * representable values (integer shifts on a dyadic phase grid, exact
  * ±a off-pulse noise, attribute-unit delays on integer grids) so each
  * stage's recovery assertion is near-exact, and the final fit recovers
  * the planted per-pulsar timing model to the last bit class.
  */
class PipelineSpec extends SparkSpec {
  import spark.implicits._

  // ------------------------------------------------------------------
  // Planted world: 2 pulsars × 4 observations, 2 subints × 8 channels ×
  // 32 bins each. Profile = gain · template circularly shifted by
  // (2 + obsIdx) bins, plus ±a alternating "noise" on bins 20..31 (mean
  // 0, RMS exactly a; never overlapping any shifted on-pulse 8+s..12+s).
  // ------------------------------------------------------------------
  private val NBin = 32
  private val NChan = 8
  private val NSub = 2
  private val Template: Array[Double] = Array.tabulate(NBin) {
    case 8 | 12 => 1.0
    case 9 | 11 => 3.0
    case 10     => 8.0
    case _      => 0.0
  }
  private val P1 = "J0437-4715" // LBAND: period 3200 µs → phase·period = shift·100 exactly
  private val P2 = "J1811-1736" // UHF:   period 6400 µs → shift·200 exactly

  private case class Obs(psr: String, idx: Int, gain: Double, aNoise: Double,
                         mjd: Double, freq: Double, bw: String, obsBw: Double,
                         nant: Long, rajd: Double, decjd: Double, periodUs: Double) {
    def obsId: String = s"${psr}_$idx"
    def shift: Int = 2 + idx
    def epochUs: Double = 50000000.0 + idx * 1000.0
  }

  // P1_3 is the planted LOW-GAIN observation the .select gate must drop
  // (snr = 8·gain/aNoise: 128 for gain 4 / a 0.25, 16 for gain 0.5).
  private val obsPlan: Seq[Obs] =
    (0 until 4).map(i => Obs(P1, i, if (i == 3) 0.5 else 4.0, 0.25,
      58900.0 + i, 1283.582, "856.0", 856.0, 56L, 69.3, -47.25, 3200.0)) ++
    (0 until 4).map(i => Obs(P2, i, 4.0, 0.5,
      59100.0 + i, 815.734, "544.0", 544.0, 40L, 272.8, -17.6, 6400.0))

  private def profileOf(o: Obs): Seq[Double] =
    (0 until NBin).map { j =>
      o.gain * Template((j - o.shift + NBin) % NBin) +
        (if (j >= 20) { if (j % 2 == 0) o.aNoise else -o.aNoise } else 0.0)
    }

  /** One PSRFITS-shaped archive: primary header with the observation
    * metadata cards, one SUBINT BINTABLE of (ISUB, ICHAN, PROFILE[32]). */
  private def archiveBytes(o: Obs): Array[Byte] = {
    def c(k: String, v: Any) = FitsCard(k, FitsFile.fmtValue(v), None)
    val primary = Seq(
      c("SIMPLE", true), c("BITPIX", 8L), c("NAXIS", 0L),
      c("SRC_NAME", o.psr), c("OBSFREQ", o.freq), c("BW", o.bw),
      c("NANT", o.nant), c("TOBS", 64.0), c("NBIN", NBin.toLong),
      c("OBSBW", o.obsBw), c("NCHAN", NChan.toLong),
      c("RAJD", o.rajd), c("DECJD", o.decjd),
      c("BECONFIG", "avn_1k"), c("MJD", o.mjd),
      c("PERIOD", o.periodUs), c("EPOCH", o.epochUs),
      c("TBIN", 4.0), c("DLY0", 10.0))
    val schema = BinTableSchema(
      Seq(BinColumn("ISUB", 'J', 1), BinColumn("ICHAN", 'J', 1),
        BinColumn("PROFILE", 'D', NBin)),
      rowSize = 4 + 4 + 8 * NBin, nrow = NSub * NChan)
    val rows = for { isub <- 0 until NSub; ichan <- 0 until NChan } yield
      Map[String, Any]("ISUB" -> isub, "ICHAN" -> ichan, "PROFILE" -> profileOf(o))
    val ext = Seq(
      FitsCard("XTENSION", FitsFile.fmtValue("BINTABLE"), None),
      c("BITPIX", 8L), c("NAXIS", 2L),
      c("NAXIS1", schema.rowSize.toLong), c("NAXIS2", schema.nrow.toLong),
      c("EXTNAME", "SUBINT"),
      c("TTYPE1", "ISUB"), c("TFORM1", "1J"),
      c("TTYPE2", "ICHAN"), c("TFORM2", "1J"),
      c("TTYPE3", "PROFILE"), c("TFORM3", s"${NBin}D"))
    FitsFile.fileBytes(Seq(
      Hdu(primary, Array.empty),
      Hdu(ext, FitsFile.tableBytes(schema, rows))))
  }

  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("pipeline").toFile
    obsPlan.foreach { o =>
      java.nio.file.Files.write(new java.io.File(d, s"${o.obsId}.fits").toPath,
        archiveBytes(o))
    }
    d.getAbsolutePath
  }

  // ---- stage 1: sources -------------------------------------------------
  private lazy val cards: DataFrame = spark.read.format("graft-fits").load(dir)

  private def metaNum(key: String) = first(
    when(col("key") === key,
      coalesce(col("double_value"), col("long_value").cast("double"))), true)
  private def metaStr(key: String) =
    first(when(col("key") === key, col("str_value")), true)

  /** One row per observation, pivoted from the card stream — the
    * obs-metadata frame every later stage keys on. */
  private lazy val meta: DataFrame = cards
    .groupBy(regexp_replace(substring_index(col("source_file"), "/", -1),
      "\\.fits$", "").as("obs_id"))
    .agg(metaStr("SRC_NAME").as("psr"), metaNum("OBSFREQ").as("freq"),
      metaStr("BW").as("bw"), metaNum("NANT").as("nant"),
      metaNum("TOBS").as("tobs"), metaNum("NBIN").as("nbin"),
      metaNum("OBSBW").as("obs_bw"), metaNum("NCHAN").as("nchan"),
      metaNum("RAJD").as("rajd"), metaNum("DECJD").as("decjd"),
      metaStr("BECONFIG").as("beconfig"), metaNum("MJD").as("mjd"),
      metaNum("PERIOD").as("period_us"), metaNum("EPOCH").as("epoch_us"),
      metaNum("TBIN").as("tbin"), metaNum("DLY0").as("dly0"))
    .withColumn("x", element_at(split(col("obs_id"), "_"), 2).cast("int"))

  /** SUBINT rows (obs_id, isub, ichan, ibin, v) — executor-side binary
    * decode through the production table parser, one task per archive. */
  private lazy val binRows: DataFrame = {
    val d = dir
    spark.read.format("binaryFile").load(d)
      .select(col("path"), col("content")).as[(String, Array[Byte])]
      .flatMap { case (p, bytes) =>
        val obsId = p.substring(p.lastIndexOf('/') + 1).stripSuffix(".fits")
        FitsFile.namedTable(bytes, "SUBINT").flatMap { m =>
          val isub = m("ISUB").asInstanceOf[Int]
          val ichan = m("ICHAN").asInstanceOf[Int]
          m("PROFILE").asInstanceOf[Seq[Any]].zipWithIndex.map { case (v, j) =>
            (obsId, isub, ichan, j, v.asInstanceOf[Double])
          }
        }
      }.toDF("obs_id", "isub", "ichan", "ibin", "v")
  }

  // ---- stage 2: delay correction (dlyfix) -------------------------------
  // Attribute-unit delays only (exact on the planted integer grids; the
  // spec's unit convention is µs). P1 (mjd < 59000): 3·TBIN + 1·DLY0 = 22;
  // P2: 10.
  private val delayConfig =
    """# planted instrument delay fixes
      |* early_backend     # pre-switchover sampling offset
      |mjd < 59000
      |delay += 3 tbin
      |* avn_config
      |beconfig ~= avn
      |delay += 1 dly0
      |* never_matches
      |beconfig ~= xyz
      |delay += 99 tbin
      |""".stripMargin
  private lazy val delayRules = DelayCorrection.parseConfig(delayConfig)
  private lazy val metaDelayed: DataFrame =
    DelayCorrection.applyTo(meta, delayRules, name => col(name))
      .withColumnRenamed("delay_correction", "delay_us")

  // ---- stage 3: flux calibration (fluxcal_meerkat) ----------------------
  private val axRa = GridLookup.Axis(crval = 0.0, crpix = 0.0, cdelt = 1.0, n = 360)
  private val axDec = GridLookup.Axis(crval = -90.0, crpix = 0.0, cdelt = 1.0, n = 180)
  private val PlantedTskyMk = 4000.0
  private val PlantedTskyUhfK = 10.0

  private lazy val chanRms: DataFrame = binRows
    .filter(col("ibin") >= 20)
    .groupBy("obs_id", "ichan")
    .agg(sqrt(avg(col("v") * col("v"))).as("offrms"))
    .join(meta.select(col("obs_id"), col("psr")), Seq("obs_id"))
    .withColumn("chan_freq",
      when(col("psr") === P1, lit(1380.0) + col("ichan") * 3.0)
        .otherwise(lit(790.0) + col("ichan") * 2.0))
    .select("obs_id", "chan_freq", "offrms")

  private lazy val multipliers: DataFrame = FluxCal.multipliers(
    meta.select("obs_id", "psr", "bw", "freq", "rajd", "decjd",
      "nant", "tobs", "nbin", "obs_bw", "nchan"),
    chanRms,
    Seq((69, 43, PlantedTskyMk)).toDF("pix1", "pix2", "tsky_mk"),
    axRa, axDec,
    Catalogs.fromText(spark, s"$P2 $PlantedTskyUhfK\n"))

  private lazy val calibRows: DataFrame =
    FluxCal.applyMultipliers(binRows, multipliers, Seq("v"))

  // the same multipliers the spec recomputes scalar-side (formula and
  // constants from FluxCal; observed rms = the planted a exactly)
  private lazy val multP1: Double = {
    val tskyJy = FluxCal.LbandScaling * (PlantedTskyMk - FluxCal.LbandZeroLevelMilliK) *
      Catalogs.GainG / 1000.0
    ((FluxCal.LbandSefd + tskyJy) / 56.0) /
      math.sqrt(2.0 * 856.0 / 8.0 * 64.0 / 32.0) / 0.25
  }
  private lazy val multP2: Double = {
    val tskyJy = PlantedTskyUhfK * Catalogs.GainG
    ((FluxCal.UhfTsys * Catalogs.GainG + tskyJy) / 40.0) /
      math.sqrt(2.0 * 544.0 / 8.0 * 64.0 / 32.0) / 0.5
  }
  private def multOf(o: Obs): Double = if (o.psr == P1) multP1 else multP2

  // ---- stage 5 input: the F+T-scrunched profile per observation ---------
  private lazy val scrunched: DataFrame = calibRows
    .groupBy("obs_id", "ibin").agg(sum(col("v")).as("pv"))
  private lazy val profiles: DataFrame = scrunched
    .groupBy("obs_id")
    .agg(transform(array_sort(collect_list(struct(col("ibin"), col("pv")))),
      s => s.getField("pv")).as("profile"))

  private lazy val toas: DataFrame = Toa.estimate(
    profiles.join(metaDelayed.select("obs_id", "psr", "x", "epoch_us",
      "period_us", "delay_us"), Seq("obs_id")),
    col("profile"), array(Template.map(lit): _*),
    col("epoch_us"), col("period_us"))

  // ---- stage 6: snr + .select gate --------------------------------------
  private lazy val withSnr: DataFrame = toas.join(
    scrunched.groupBy("obs_id").agg(
      max(col("pv")).as("flux_peak"),
      sqrt(avg(when(col("ibin") >= 20, col("pv") * col("pv")))).as("off_rms")),
    Seq("obs_id"))
    .withColumn("snr", col("flux_peak") / col("off_rms"))
  private lazy val selectRules =
    ToaSelect.parse("# planted quality gate\nLOGIC -snr < 20 REJECT\n")
  private lazy val selected: DataFrame =
    ToaSelect.filter(withSnr, selectRules, Map("snr" -> col("snr")))

  // ---- stage 7: timing fit ----------------------------------------------
  private def yCol = col("toa_us") - col("delay_us") - col("epoch_us")
  private def xsCols = Seq(lit(1.0), col("x").cast("double"),
    (col("x") * col("x")).cast("double"))

  test("stage 1 — graft-fits reads the fabricated archives; metadata pivots to one row per observation") {
    val m = meta.collect().map(r => r.getAs[String]("obs_id") -> r).toMap
    assert(m.size == 8)
    obsPlan.foreach { o =>
      val r = m(o.obsId)
      assert(r.getAs[String]("psr") == o.psr, o.obsId)
      assert(r.getAs[String]("bw") == o.bw, o.obsId)
      assert(r.getAs[Double]("freq") == o.freq, o.obsId)
      assert(r.getAs[Double]("nant") == o.nant.toDouble, o.obsId)
      assert(r.getAs[Double]("period_us") == o.periodUs, o.obsId)
      assert(r.getAs[Double]("epoch_us") == o.epochUs, o.obsId)
      assert(r.getAs[Int]("x") == o.idx, o.obsId)
    }
    // the binary half: every archive's SUBINT table decodes to the full grid
    assert(binRows.count() == 8L * NSub * NChan * NBin)
    val one = binRows.filter(col("obs_id") === s"${P1}_0" &&
      col("isub") === 0 && col("ichan") === 0)
      .orderBy("ibin").select("v").as[Double].collect()
    assert(one.toSeq == profileOf(obsPlan.head))
  }

  test("stage 2 — distributed delay correction matches scalar totalDelay and the planted values") {
    val got = metaDelayed.select("obs_id", "delay_us").as[(String, Double)]
      .collect().toMap
    obsPlan.foreach { o =>
      val props = Map("mjd" -> o.mjd.toString, "beconfig" -> "avn_1k",
        "tbin" -> "4.0", "dly0" -> "10.0")
      val scalar = DelayCorrection.totalDelay(delayRules, props)
      assert(got(o.obsId) == scalar, s"${o.obsId}: applyTo vs totalDelay")
      assert(got(o.obsId) == (if (o.psr == P1) 22.0 else 10.0), o.obsId)
    }
  }

  test("stage 3 — flux calibration recovers the planted off-pulse RMS and multiplier") {
    val rows = multipliers.collect().map(r => r.getAs[String]("obs_id") -> r).toMap
    assert(rows.size == 8)
    obsPlan.foreach { o =>
      val r = rows(o.obsId)
      assert(r.getAs[String]("band") == (if (o.psr == P1) "LBAND" else "UHF"), o.obsId)
      // observed median off-pulse RMS = the planted noise amplitude, exactly
      assert(math.abs(r.getAs[Double]("observed_rms") - o.aNoise) < 1e-12, o.obsId)
      assert(math.abs(r.getAs[Double]("multiplier") - multOf(o)) < 1e-9 * multOf(o), o.obsId)
    }
    // the apply half scales every sample by exactly the multiplier
    val before = binRows.filter(col("obs_id") === s"${P1}_1" && col("ibin") === 12)
      .agg(sum("v")).as[Double].head()
    val after = calibRows.filter(col("obs_id") === s"${P1}_1" && col("ibin") === 12)
      .agg(sum("v")).as[Double].head()
    assert(math.abs(after - before * multP1) < 1e-9 * math.abs(after))
  }

  test("stage 4 — decimation products aggregate the calibrated subint rows exactly") {
    val (plans, globals) = Downsample.parseFlags("t 2 f 4, tscrunch, fscrunch, pscrunch")
    assert(globals == Set("pscrunch"))
    val prods = Downsample.products(calibRows, Seq("obs_id"),
      col("isub"), col("ichan"), col("v"), plans)
      .filter(col("obs_id") === s"${P1}_0").collect()
      .map(r => (r.getAs[String]("plan"), r.getAs[Long]("t_bin"),
        r.getAs[Long]("f_bin")) -> r).toMap
    val g = 4.0; val sumT = Template.sum // 16
    // t2f4: one t_bin (2 subints / 2), two f_bins (8 chans / 4)
    assert(prods.keys.count(_._1 == "t2f4") == 2)
    val t2f4 = prods(("t2f4", 0L, 1L))
    assert(t2f4.getAs[Long]("n") == NSub * 4 * NBin)
    assert(math.abs(t2f4.getAs[Double]("sum_value") - NSub * 4 * g * sumT * multP1) < 1e-3)
    // fscrunch: per-subint rows, noise cancels exactly in the decimal sum
    assert(prods.keys.count(_._1 == "fscrunch") == NSub)
    val fs = prods(("fscrunch", 1L, 0L))
    assert(fs.getAs[Long]("n") == NChan * NBin)
    assert(math.abs(fs.getAs[Double]("sum_value") - NChan * g * sumT * multP1) < 1e-3)
    // tscrunch: per-channel rows
    assert(prods.keys.count(_._1 == "tscrunch") == NChan)
    val ts = prods(("tscrunch", 0L, 3L))
    assert(ts.getAs[Long]("n") == NSub * NBin)
    assert(math.abs(ts.getAs[Double]("sum_value") - NSub * g * sumT * multP1) < 1e-3)
  }

  test("stage 5 — TOA estimation recovers every planted integer shift") {
    val got = toas.select("obs_id", "k_peak", "shift_bins", "toa_us")
      .as[(String, Long, Double, Double)].collect()
      .map(t => t._1 -> (t._2, t._3, t._4)).toMap
    assert(got.size == 8)
    obsPlan.foreach { o =>
      val (k, sb, toa) = got(o.obsId)
      assert(k == o.shift, s"${o.obsId}: k_peak")
      // symmetric CCF around an integer shift → parabolic δ exactly 0
      assert(math.abs(sb - o.shift) < 1e-9, s"${o.obsId}: shift_bins")
      val planted = o.epochUs + o.shift.toDouble / NBin * o.periodUs
      assert(math.abs(toa - planted) < 1e-6, s"${o.obsId}: toa_us")
    }
  }

  test("stage 6 — the .select gate drops exactly the planted low-snr observation") {
    val snrs = withSnr.select("obs_id", "snr").as[(String, Double)].collect().toMap
    obsPlan.foreach { o =>
      assert(math.abs(snrs(o.obsId) - 8.0 * o.gain / o.aNoise) < 1e-9, o.obsId)
    }
    val kept = selected.select("obs_id").as[String].collect().toSet
    assert(kept == obsPlan.map(_.obsId).toSet - s"${P1}_3")
  }

  test("stage 7 — timing fit recovers the planted per-pulsar model with zero residuals") {
    // planted: corrected toa − epoch = (shift·period/nbin) − delay
    //   P1: 100·(2+x) − 22 = 178 + 100x   (3 surviving points: exact solve)
    //   P2: 200·(2+x) − 10 = 390 + 200x   (4 points, exactly collinear)
    val expected = Map(P1 -> Seq(178.0, 100.0, 0.0), P2 -> Seq(390.0, 200.0, 0.0))
    val resid = TimingFit.residuals3(selected, Seq("psr"), yCol, lit(1.0), xsCols)
    resid.select("psr", "beta0", "beta1", "beta2", "resid")
      .as[(String, Double, Double, Double, Double)].collect().foreach {
        case (psr, b0, b1, b2, r) =>
          val e = expected(psr)
          assert(math.abs(b0 - e(0)) < 1e-9 && math.abs(b1 - e(1)) < 1e-9 &&
            math.abs(b2 - e(2)) < 1e-9, s"$psr betas ($b0, $b1, $b2)")
          assert(math.abs(r) < 1e-9, s"$psr resid $r")
      }
    // diagnostics on the same one-pass moments (integer grid → exact)
    val diag = TimingFit.diagnostics3(TimingFit.moments(selected, Seq("psr"),
      yCol, lit(1.0), xsCols, withY2 = true, integerGrid = true))
      .select("psr", "chi2", "wrms", "chi2_red", "n")
      .as[(String, Double, Double, Option[Double], Long)].collect()
      .map(t => t._1 -> t).toMap
    assert(math.abs(diag(P1)._2) < 1e-6 && math.abs(diag(P2)._2) < 1e-6)
    assert(diag(P1)._4.isEmpty, "P1: n=3 → chi2_red undefined")
    assert(diag(P2)._5 == 4L && math.abs(diag(P2)._4.get) < 1e-6)
    // the general Gaussian-elimination path agrees with the Cramer path
    TimingFit.fit(selected, Seq("psr"), yCol, lit(1.0), xsCols)
      .select("psr", "betas").as[(String, Seq[Double])].collect().foreach {
        case (psr, betas) =>
          assert(betas.zip(expected(psr)).forall { case (a, b) => math.abs(a - b) < 1e-9 },
            s"$psr fit betas $betas")
      }
  }

  test("stage 8 — results JSON and dynspec PNG carry the planted values end-to-end") {
    val metrics = withSnr
      .join(multipliers.select("obs_id", "multiplier"), Seq("obs_id"))
      .selectExpr("obs_id",
        "stack(3, 'sn', snr, 'flux', flux_peak, 'multiplier', multiplier) as (metric, value)")
    val res = Results.assemble(metrics, "obs_id", "metric", "value",
      Seq("sn", "flux", "dm", "multiplier"))
    val row = res.filter(col("obs_id") === s"${P1}_0")
      .select("sn", "multiplier", "results_json")
      .as[(Double, Double, String)].head()
    assert(math.abs(row._1 - 128.0) < 1e-9)
    assert(math.abs(row._2 - multP1) < 1e-9 * multP1)
    // raw-only metrics stay as explicit JSON nulls, like the reference's dict
    assert(row._3.contains("\"dm\":null"), row._3)
    // the JSON round-trips the same double the column carries (the snr
    // division is exact only up to the multiplier's rounding)
    assert(math.abs(row._3.split("\"sn\":")(1).takeWhile(c => c != ',' && c != '}').toDouble
      - 128.0) < 1e-9, row._3)

    val png = Raster.renderDynspec(
      calibRows.filter(col("obs_id") === s"${P1}_0" && col("isub") === 0),
      "obs_id", "ibin", "ichan", "v")
      .select("png", "n_time", "n_chan", "width", "height")
      .as[(Array[Byte], Int, Int, Int, Int)].head()
    assert(png._2 == NBin && png._3 == NChan)
    val magic = png._1.take(8).map(_ & 0xff)
    assert(magic.sameElements(Array(0x89, 'P'.toInt, 'N'.toInt, 'G'.toInt, 0x0d, 0x0a, 0x1a, 0x0a)))
    val img = ImageIO.read(new ByteArrayInputStream(png._1))
    assert(img.getWidth == png._4 && img.getHeight == png._5)
  }
}
