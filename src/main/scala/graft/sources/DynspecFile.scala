package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** psrflux dynamic-spectrum text files — the whitespace-separated format
  * `calc_dynspec_zap_fraction` reads with np.loadtxt
  * (archive_utils.py:118): `#` comments, then columns
  * (time_idx, chan_idx, time_s, freq_mhz, flux, flux_err); a cell is
  * zapped when flux == 0 AND flux_err == 0 (columns 4 and 5).
  * COMMENT CONTRACT: np.loadtxt truncates each line at the FIRST `#`
  * wherever it appears (comments='#' default), not only at line start —
  * so a data line with a trailing `# note` still parses, and a `#`
  * landing before the 6th column leaves a short line. This parser does
  * the same truncation; the one disclosed leniency is that short lines
  * then DROP where np.loadtxt raises a column-count error.
  *
  * Parsing is a per-row Scala function fanned out through a typed
  * flatMap (the ParFile/ResidualFile/ProjectConfig shape) rather than a
  * Column-expression chain: a chain of `split`/`element_at`/`cast`
  * projections gets INLINED into every consumer when Catalyst collapses
  * projections — measured 9 s for 1M rows at sf1 (the regex split and
  * the line expression re-evaluated per referencing column) vs 1.07 s
  * for the identical work as one flatMap. Malformed numeric tokens
  * throw (np.loadtxt raises on garbage too); comments, blanks and
  * short (<6 token) lines drop; extra trailing tokens are ignored
  * (usecols semantics).
  */
object DynspecFile {

  final case class Cell(time_idx: Int, chan_idx: Int, time_s: Double,
                        freq_mhz: Double, flux: Double, flux_err: Double) {
    def zapped: Boolean = flux == 0.0 && flux_err == 0.0
  }

  /** One text line → zero or one typed cell. The line truncates at the
    * first `#` ANYWHERE (np.loadtxt's comments handling — see the
    * object scaladoc), which also covers whole-line and
    * whitespace-indented comments; whatever remains is trimmed before
    * the emptiness test. Index tokens parse through DOUBLE (np.loadtxt reads every
    * column as float, so a float-writing producer emits `0.0 5.0 ...`
    * for the index columns — a bare toInt would reject a file the
    * reference reads fine); truncation toward zero matches numpy's
    * int conversion. */
  def parseLine(line: String): Option[Cell] = {
    val hash = line.indexOf('#')
    val l = (if (hash >= 0) line.substring(0, hash) else line).trim
    if (l.isEmpty) return None
    val t = l.split("\\s+")
    if (t.length < 6) return None
    Some(Cell(t(0).toDouble.toInt, t(1).toDouble.toInt, t(2).toDouble,
      t(3).toDouble, t(4).toDouble, t(5).toDouble))
  }

  /** Distributed parse of one or many dynspec files. */
  def load(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.read.textFile(path)
      .flatMap(l => parseLine(l).map(c =>
        (c.time_idx, c.chan_idx, c.time_s, c.freq_mhz, c.flux, c.flux_err, c.zapped)))
      .toDF("time_idx", "chan_idx", "time_s", "freq_mhz", "flux", "flux_err", "zapped")
  }

  /** Column-level form of [[load]]: each (id, line) row parses to zero
    * or one typed dynspec cell row through [[parseLine]] itself —
    * q148's oracle cross-checks the production parser, not a copy.
    * Null ids/lines drop and the id casts to long (the ParseColumn
    * contract shared with ParFile/ResidualFile). */
  def parseColumn(df: DataFrame, idCol: String, lineCol: String): DataFrame =
    ParseColumn.rows(df, idCol, lineCol) { (id, l) =>
      parseLine(l).map(c =>
        (id, c.time_idx, c.chan_idx, c.time_s, c.freq_mhz, c.flux, c.flux_err, c.zapped))
    }.toDF("cell_id", "time_idx", "chan_idx", "time_s", "freq_mhz", "flux",
      "flux_err", "zapped")

  /** Zapped-cell fraction (archive_utils.py:118), distributed. An empty
    * dynspec (headers only) yields 0.0 rather than a null-unboxing NPE. */
  def zapFraction(dynspec: DataFrame): Double = {
    val row = dynspec.agg(
      coalesce(sum(col("zapped").cast("long")).cast("double") / count(lit(1)), lit(0.0))
        .as("frac"))
      .head()
    row.getDouble(0)
  }
}
