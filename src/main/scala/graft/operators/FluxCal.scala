package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Catalogs

/** End-to-end flux calibration — the distributed composition of the
  * reference's `fluxcal_meerkat.py main()` (scripts/fluxcal_meerkat.py:355):
  * band detection → receiver-dependent sky temperature (CHIPASS grid for
  * LBAND, per-pulsar catalogue for UHF) → system flux density → radiometer
  * expected RMS → observed off-pulse median RMS in the reference window →
  * multiplier. The reference processes ONE observation per process via
  * psrchive shell-outs; this form runs the whole observation table in one
  * job: calibration inputs broadcast, per-observation math in columns, one
  * window for the channel median.
  */
object FluxCal {

  /** Receiver band from bandwidth + centre frequency — exact mirror of
    * `get_band` (archive_utils.py:22), including the string-typed BW
    * comparison; unknown combinations → null like the reference's None. */
  def bandOf(bw: Column, freq: Column): Column =
    when(bw === "544.0" && freq < 816.0 && freq > 815.0, "UHF")
      .when(freq < 1284.0 && freq > 1283.0, "LBAND")
      .when(bw === "875.0" && freq < 2189.0 && freq > 2185.0, "SBAND_0")
      .when(bw === "875.0" && freq < 2408.0 && freq > 2404.0, "SBAND_1")
      .when(bw === "875.0" && freq < 2627.0 && freq > 2623.0, "SBAND_2")
      .when(bw === "875.0" && freq < 2845.0 && freq > 2841.0, "SBAND_3")
      .when(bw === "875.0" && freq < 3064.0 && freq > 3060.0, "SBAND_4")

  /** LBAND/UHF constants of fluxcal_meerkat.py; the antenna gain G lives
    * in Catalogs.GainG (shared with the UHF Tsky conversion). */
  val LbandTskyDefaultMilliK = 3400.0     // fluxcal_meerkat.py:156
  val LbandZeroLevelMilliK = 3372.0       // SARAO zero-level offset (:224)
  val LbandScaling = 1.7202               // "new conversion - Jan 2022" (:225)
  val LbandSefd = 390.0                   // :264
  val UhfTsys = 18.5                      // :267
  val LbandWindow = (1383.0, 1400.0)      // get_median_offrms (:313)
  val UhfWindow = (795.0, 805.0)

  /** Per-observation flux multipliers.
    *
    * @param obs one row per observation with columns: `obs_id`, `psr`,
    *   `bw` (string, PSRFITS-style), `freq` (centre, MHz), `rajd`/`decjd`
    *   (degrees), `nant`, `tobs` (s), `nbin`, `obs_bw` (MHz, numeric),
    *   `nchan`
    * @param chanRms per-channel off-pulse RMS: (`obs_id`, `chan_freq`,
    *   `offrms`)
    * @param tskyGrid CHIPASS-equatorial grid rows (`pix1`,`pix2`,`tsky_mk`)
    * @param uhfCat   UHF Tsky catalogue (name, value) — Catalogs.fromText
    * @return obs_id, psr, band, tsky_jy, ssys, expected_rms, observed_rms,
    *   multiplier (SBAND observations: multiplier 1.0, null calibration
    *   columns — fluxcal_meerkat.py:414)
    */
  def multipliers(obs: DataFrame, chanRms: DataFrame,
                  tskyGrid: DataFrame, ax1: GridLookup.Axis, ax2: GridLookup.Axis,
                  uhfCat: DataFrame): DataFrame = {
    val banded = obs.withColumn("band", bandOf(col("bw"), col("freq")))

    // LBAND: CHIPASS grid keyed by (rajd, decjd), blanked/out-of-range →
    // default, then mK → Jy (fluxcal_meerkat.py:195-226)
    val withGrid = GridLookup.nearest(banded, tskyGrid.withColumnRenamed("tsky_mk", "v"),
        col("rajd"), col("decjd"), ax1, ax2, "v", default = LbandTskyDefaultMilliK)
      .withColumnRenamed("looked_up", "tsky_mk")
    // UHF: per-pulsar catalogue recall with cold-sky default (:231-249);
    // withTskyUhf already attaches the K→Jy conversion as tsky_jy, which
    // the LBAND branch overrides with the grid-based mK→Jy formula
    val withTsky = Catalogs.withTskyUhf(withGrid, "psr", uhfCat)
      .withColumn("tsky_jy",
        when(col("band") === "LBAND",
          lit(LbandScaling) * (col("tsky_mk") - lit(LbandZeroLevelMilliK)) *
            lit(Catalogs.GainG / 1000.0))
          .when(col("band") === "UHF", col("tsky_jy")))
      .withColumn("sefd",
        when(col("band") === "LBAND", lit(LbandSefd))
          .when(col("band") === "UHF", lit(UhfTsys * Catalogs.GainG)))
      .withColumn("ssys", (col("sefd") + col("tsky_jy")) / col("nant"))
      .withColumn("expected_rms",
        col("ssys") / sqrt(lit(2.0) * col("obs_bw") / col("nchan") * col("tobs") / col("nbin")))

    // observed RMS: np.median of the off-pulse RMS over the band's
    // reference-frequency channels (get_median_offrms, :311) — the mean of
    // the one or two middle elements of the sorted values
    val lo = when(col("band") === "LBAND", LbandWindow._1).otherwise(UhfWindow._1)
    val hi = when(col("band") === "LBAND", LbandWindow._2).otherwise(UhfWindow._2)
    val w = Window.partitionBy("obs_id").orderBy(col("offrms"), col("chan_freq"))
    val medians = banded.select(col("obs_id").as("rms_obs_id"), col("band"))
      // only LBAND/UHF run get_median_offrms in the reference; SBAND and
      // unknown bands never reach the observed-RMS computation
      .filter(col("band").isin("LBAND", "UHF"))
      .join(chanRms, col("rms_obs_id") === chanRms("obs_id"))
      // a channel with no measured RMS carries no information: the median
      // ranks NON-NULL values only (null-ranking order and the rank count
      // would otherwise both shift the selected order statistic — and
      // differently per engine: Spark sorts nulls first, others last)
      .filter(col("offrms").isNotNull)
      .filter(col("chan_freq") >= lo && col("chan_freq") < hi)
      .withColumn("rn", row_number().over(w))
      .withColumn("cnt", count(lit(1)).over(Window.partitionBy("obs_id")))
      .filter(col("rn") === ((col("cnt") + 1) / lit(2)).cast("long") ||
        col("rn") === (col("cnt") / lit(2)).cast("long") + 1)
      .groupBy(col("rms_obs_id"))
      .agg(avg(col("offrms")).as("observed_rms"))

    withTsky
      .join(medians, withTsky("obs_id") === medians("rms_obs_id"), "left")
      .drop("rms_obs_id")
      .withColumn("multiplier",
        when(col("band").startsWith("SBAND"), lit(1.0))
          .otherwise(col("expected_rms") / col("observed_rms")))
      .select("obs_id", "psr", "band", "tsky_jy", "ssys",
        "expected_rms", "observed_rms", "multiplier")
  }

  /** The apply step — the reference's ACTUAL output (`fluxcalibrate`,
    * scripts/fluxcal_meerkat.py:344): every decimated product is scaled
    * in place by its observation's multiplier (`pam --mult … -e fluxcal`).
    * Distributed form: broadcast the (one-row-per-observation) multiplier
    * table and scale `valueCols` — no shuffle of the big value table at
    * any scale. Rows whose observation has no multiplier pass through
    * unscaled, mirroring the reference only rewriting archives it
    * calibrated. */
  def applyMultipliers(values: DataFrame, multipliers: DataFrame,
                       valueCols: Seq[String], obsIdCol: String = "obs_id"): DataFrame = {
    val m = broadcast(
      multipliers.select(col(obsIdCol).as("__mult_obs_id"), col("multiplier")))
    val joined = values.join(m, values(obsIdCol) === col("__mult_obs_id"), "left")
    valueCols.foldLeft(joined) { (df, c) =>
      df.withColumn(c,
        when(col("multiplier").isNotNull, col(c) * col("multiplier")).otherwise(col(c)))
    }.drop("__mult_obs_id", "multiplier")
  }
}
