package graft.sources

import scala.util.Try

import org.apache.spark.sql.{DataFrame, SparkSession}

/** tempo2 `general2` residual interchange — the text the reference's
  * wrapper emits per archive (tempo2_wrapper.sh:37:
  * `-output general2 -s "{bat} {post} {err} {freq} {post_phase}
  * {flags}\n" -outfile <archive>.residual`): five numeric columns —
  * barycentric arrival time (MJD), postfit residual (s), its error (ns),
  * frequency (MHz), postfit residual in phase — then the TOA flags to
  * end of line (zero or more `-key value` tokens), carried with
  * whitespace runs normalized to single spaces (the line is tokenized
  * on `\s+` and re-joined — token semantics survive, original spacing
  * does not). Existing
  * `.residual` files produced by tempo2 runs ingest through this source
  * for comparison against graft's own fit diagnostics (q131/q146).
  *
  * Lines that don't carry five leading numerics (blank lines, '#'
  * comments, tempo2 banner noise) skip — the Option-per-line leniency of
  * [[ParFile.parseLine]]; the typed columns downstream surface a
  * mis-shaped file as an empty frame, not a wrong one.
  */
object ResidualFile {

  final case class Residual(bat: Double, post: Double, err: Double,
                            freq: Double, postPhase: Double, flags: String)

  def parseLine(line: String): Option[Residual] = {
    val l = line.trim
    if (l.isEmpty || l.startsWith("#")) return None
    val t = l.split("\\s+")
    if (t.length < 5) return None
    for {
      bat <- Try(t(0).toDouble).toOption
      post <- Try(t(1).toDouble).toOption
      err <- Try(t(2).toDouble).toOption
      freq <- Try(t(3).toDouble).toOption
      phase <- Try(t(4).toDouble).toOption
    } yield Residual(bat, post, err, freq, phase,
      t.drop(5).mkString(" "))
  }

  def parse(text: String): Seq[Residual] =
    text.linesIterator.flatMap(parseLine).toSeq

  /** Distributed load: `.residual` file(s) → one typed row per TOA, with
    * `source_file` keeping multi-archive loads separable. */
  def load(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.read.textFile(path)
      .withColumn("source_file", org.apache.spark.sql.functions.input_file_name())
      .as[(String, String)]
      .flatMap { case (l, f) =>
        parseLine(l).map(r => (f, r.bat, r.post, r.err, r.freq, r.postPhase, r.flags))
      }
      .toDF("source_file", "bat", "post", "err", "freq", "post_phase", "flags")
  }

  /** Column-level form for fabricated-text oracling (q146): each
    * (id, line) row parses to zero-or-one typed residual row. */
  def parseColumn(df: DataFrame, idCol: String, lineCol: String): DataFrame =
    ParseColumn.rows(df, idCol, lineCol) { (id, l) =>
      parseLine(l).map(r => (id, r.bat, r.post, r.err, r.freq, r.postPhase, r.flags))
    }.toDF("toa_id", "bat", "post", "err", "freq", "post_phase", "flags")
}
