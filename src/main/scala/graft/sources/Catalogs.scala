package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Calibration-catalogue dimension tables — the engine-level form of the
  * lookup files meerpipe wires in `data_load.py:12-20`: the per-pulsar UHF
  * sky-temperature table (`UHF_Tsky.dat`, consumed by `get_tsky_updated`'s
  * UHF branch, scripts/fluxcal_meerkat.py:231-250) and the rotation-measure
  * catalogue (`rm_catalogue.txt`).
  *
  * Both files are `NAME VALUE` text with `#` comments (HeaderFile format).
  * At scale they are tiny dimensions: loaded once, broadcast, left-joined
  * against the observation facts, with the reference's
  * default-when-missing fallback — so the fact scan stays one pass.
  */
object Catalogs {

  /** MeerKAT antenna gain, K/Jy⁻¹-ish constant `G = 19` used throughout
    * fluxcal_meerkat.py. */
  val GainG = 19.0

  /** Reference cold-sky default for pulsars missing from the UHF table,
    * Kelvin (fluxcal_meerkat.py:234). */
  val TskyUhfDefaultK = 5.5

  /** Parse `NAME VALUE` catalogue text into a (name, value) DataFrame —
    * the fixed schema the join helpers below consume. */
  def fromText(spark: SparkSession, text: String): DataFrame = {
    import spark.implicits._
    HeaderFile.parse(text).toSeq
      .map { case (k, v) => (k, v.toDouble) }
      .toDF("name", "value")
  }

  /** Attach `tsky_k` and `tsky_jy` from the UHF Tsky catalogue: recalled
    * per pulsar, default 5.5 K when absent, converted to Jy with G
    * (fluxcal_meerkat.py:239-249). Catalogue is broadcast. */
  def withTskyUhf(obs: DataFrame, psrCol: String, catalog: DataFrame,
                  defaultK: Double = TskyUhfDefaultK): DataFrame = {
    // key column aliased so dropping it can't eat an obs column named "name"
    val dim = broadcast(catalog.select(col("name").as("__cat_name"), col("value").as("__tsky")))
    obs.join(dim, obs(psrCol) === dim("__cat_name"), "left")
      .drop("__cat_name")
      .withColumn("tsky_k", coalesce(col("__tsky"), lit(defaultK)))
      .withColumn("tsky_jy", col("tsky_k") * lit(GainG))
      .drop("__tsky")
  }

  /** Attach `rm` from the rotation-measure catalogue, `default` (0.0: no
    * correction) when the pulsar is uncatalogued. Catalogue is broadcast. */
  def withRm(obs: DataFrame, psrCol: String, catalog: DataFrame,
             default: Double = 0.0): DataFrame = {
    val dim = broadcast(catalog.select(col("name").as("__cat_name"), col("value").as("__rm")))
    obs.join(dim, obs(psrCol) === dim("__cat_name"), "left")
      .drop("__cat_name")
      .withColumn("rm", coalesce(col("__rm"), lit(default)))
      .drop("__rm")
  }
}
