package graft.sources

import scala.util.Try

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Pulsar ephemeris (.par) key-value config parsing with typed coercion —
  * the engine-level form of `binary_tools.read_par` (binary_tools.py:26):
  * skip comments and ignored params, rename E→ECC, D→E exponent fix,
  * classify each value as int ('d'), fixed ('f'), scientific ('e') or
  * string ('s'), and carry the optional uncertainty column.
  */
object ParFile {

  /** Params the reference ignores (binary_tools.py:31). */
  val Ignored: Set[String] = Set(
    "DMMODEL", "DMOFF", "DM_", "CM_", "CONSTRAIN", "JUMP", "NITS",
    "NTOA", "CORRECT_TROPOSPHERE", "PLANET_SHAPIRO", "DILATEFREQ",
    "TIMEEPH", "MODE", "TZRMJD", "TZRSITE", "TZRFRQ", "EPHVER", "T2CMETHOD")

  final case class ParEntry(param: String, raw: String, valueType: String,
                            numValue: Option[Double], err: Option[Double])

  def parseLine(line: String): Option[ParEntry] = {
    val sline = line.trim.split("\\s+").toSeq
    if (sline.isEmpty || sline.head.isEmpty || line.startsWith("#") ||
        line.startsWith("C ") || Ignored.contains(sline.head)) return None

    val param = if (sline.head == "E") "ECC" else sline.head
    if (sline.length < 2) return None
    val rawVal = sline(1)

    val err: Option[Double] = sline match {
      case s if s.length == 3 && s(2) != "0" && s(2) != "1" =>
        Try(s(2).replace("D", "E").toDouble).toOption
      case s if s.length >= 4 => Try(s(3).replace("D", "E").toDouble).toOption
      case _ => None
    }

    val asInt = Try(rawVal.toLong).toOption
    val asFloat = Try(BigDecimal(rawVal.replace("D", "E"))).toOption
    val (vt, num) = asInt match {
      case Some(i) => ("d", Some(i.toDouble))
      case None => asFloat match {
        case Some(f) =>
          val t = if (rawVal.toUpperCase.replace("D", "E").contains("E")) "e" else "f"
          (t, Some(f.toDouble))
        case None => ("s", None)
      }
    }
    Some(ParEntry(param, rawVal, vt, num, err))
  }

  def parse(text: String): Seq[ParEntry] =
    text.linesIterator.flatMap(parseLine).toSeq

  /** Distributed load: one or many .par files → a DataFrame of entries
    * (param, raw, valueType, numValue, err, source_file) — source_file
    * keeps multi-file loads separable per pulsar. */
  def load(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val lines = spark.read.textFile(path)
      .withColumn("source_file", org.apache.spark.sql.functions.input_file_name())
      .as[(String, String)]
    lines
      .flatMap { case (l, f) => parseLine(l).map(e => (e.param, e.raw, e.valueType, e.numValue, e.err, f)) }
      .toDF("param", "raw", "valueType", "numValue", "err", "source_file")
  }

  /** Column-level form of [[parseLine]]: each (id, line) row parses to
    * zero-or-one typed entry row — comments, ignored params and short
    * lines drop. The flatMap IS the production parser (same code path as
    * [[load]]); q143's oracle replays the classification rules (int vs
    * fixed vs scientific vs string, D→E exponents, E→ECC rename,
    * fit-flag-aware uncertainty column) in SQL against lines fabricated
    * from table columns, so the typing table stays cross-checked. */
  def parseColumn(df: DataFrame, idCol: String, lineCol: String): DataFrame =
    ParseColumn.rows(df, idCol, lineCol) { (id, l) =>
      parseLine(l).map(e => (id, e.param, e.raw, e.valueType, e.numValue, e.err))
    }.toDF("line_id", "param", "raw", "value_type", "num_value", "err")

  /** Convenience: entries → (param → numeric value) map, like the
    * reference's dict. Driver-side; for small ephemerides only. */
  def toParams(entries: Seq[ParEntry]): Map[String, Double] =
    entries.flatMap(e => e.numValue.map(e.param -> _)).toMap
}

/** Plain `KEY VALUE` header parsing — `get_listinfo`
  * (scripts/fluxcal_meerkat.py:20), used for obs.header and lookup
  * tables (e.g. the UHF Tsky table). BEHAVIOR CONTRACT: a lenient
  * SUPERSET of get_listinfo, which `line.split()`-unpacks into exactly
  * two names and so RAISES on blank lines, comments, key-only lines
  * and >2-token lines. On every line where get_listinfo succeeds
  * (exactly two whitespace-separated tokens) the two agree; on lines
  * where it would crash, this parser drops the unusable ones (blank /
  * `#` / key-only) and keeps multi-token values whole (everything past
  * the first whitespace run) instead of failing the file. */
object HeaderFile {
  def parse(text: String): Map[String, String] =
    text.linesIterator
      .map(_.trim)
      .filter(l => l.nonEmpty && !l.startsWith("#"))
      .flatMap { l =>
        val parts = l.split("\\s+", 2)
        if (parts.length == 2) Some(parts(0) -> parts(1).trim) else None
      }.toMap

  /** Column-level form of [[parse]]: each (id, header-text) row fans out
    * to one row per parsed key — blank lines, `#` comments (indented
    * ones too) and key-only lines drop (where get_listinfo would raise —
    * see the object scaladoc's lenient-superset contract); the value is
    * everything past the first whitespace run; duplicate keys keep the
    * LAST occurrence (matching get_listinfo's last-assignment-wins dict
    * build, the one behavior shared verbatim).
    * The flatMap goes through [[parse]] itself, so q147's oracle
    * cross-checks the production parser, not a re-implementation. Row
    * order within a header is Map-iteration order (unordered contract —
    * the driver compare sorts). */
  def parseColumn(df: DataFrame, idCol: String, textCol: String): DataFrame =
    ParseColumn.rows(df, idCol, textCol) { (id, t) =>
      parse(t).map { case (k, v) => (id, k, v) }
    }.toDF("hdr_id", "key", "value")
}
