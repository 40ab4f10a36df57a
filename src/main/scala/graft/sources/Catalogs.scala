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

  /** Parse `NAME RAJD DECJD` position-catalogue text (degrees, `#`
    * comments, blank lines skipped) into (name, rajd, decjd) — the
    * engine-level form of the reference's `psrcat -c "rajd decjd"`
    * shell-out (`get_radec`, scripts/fluxcal_meerkat.py:74-88): the
    * pulsar catalogue as a broadcastable dimension table instead of a
    * subprocess per pulsar. */
  def positionsFromText(spark: SparkSession, text: String): DataFrame = {
    import spark.implicits._
    text.linesIterator
      .map(_.trim).filter(l => l.nonEmpty && !l.startsWith("#"))
      .map { l =>
        val parts = l.split("\\s+")
        require(parts.length == 3, s"position catalogue line needs NAME RAJD DECJD: '$l'")
        (parts(0), parts(1).toDouble, parts(2).toDouble)
      }
      .toSeq.toDF("name", "rajd", "decjd")
  }

  /** Attach `ra_deg`/`dec_deg` resolved by NAME from a position
    * catalogue, falling back to caller-supplied coordinate columns (the
    * .par-file route, `get_radec_new`, fluxcal_meerkat.py:91-130 — the
    * route meerpipe itself prefers when a par file exists) for
    * uncatalogued names; `pos_source` records which route won
    * ("catalog" / "par", null when neither resolves). Catalogue is
    * broadcast — the fact scan stays one pass. */
  def withRaDec(obs: DataFrame, nameCol: String, catalog: DataFrame,
                raFallback: org.apache.spark.sql.Column,
                decFallback: org.apache.spark.sql.Column): DataFrame = {
    val dim = broadcast(catalog.select(col("name").as("__cat_name"),
      col("rajd").as("__rajd"), col("decjd").as("__decjd")))
    // BOTH routes resolve only as a PAIR: a half-parsed fallback (ra
    // without dec) must not leak one real coordinate under a null
    // pos_source — "null means neither route resolved" is the contract —
    // and a partially-null catalogue row (possible when the caller built
    // the catalog DataFrame elsewhere; positionsFromText can't produce
    // one) must not mix catalogue ra with par dec under 'catalog'
    val parOk = raFallback.isNotNull && decFallback.isNotNull
    val catOk = col("__rajd").isNotNull && col("__decjd").isNotNull
    obs.join(dim, obs(nameCol) === dim("__cat_name"), "left")
      .withColumn("ra_deg", coalesce(when(catOk, col("__rajd")), when(parOk, raFallback)))
      .withColumn("dec_deg", coalesce(when(catOk, col("__decjd")), when(parOk, decFallback)))
      .withColumn("pos_source",
        when(catOk, "catalog")
          .when(parOk, "par")
          .otherwise(lit(null).cast("string")))
      .drop("__cat_name", "__rajd", "__decjd")
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
