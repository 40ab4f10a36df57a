package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Downsample

/** Project-specific pipeline configuration files as a typed dimension —
  * the launcher-input surface of the reference
  * (the `configuration_files/project_specific` .config files, e.g.
  * dm_offset_pta.config, meertime_1909_searchmode.config): `key = value`
  * lines, '#' comments (including indented and '##' variants), later
  * assignments overriding earlier ones (the shipped files keep
  * commented-out alternates around the active line, and dm_offset_pta
  * genuinely assigns `output_path` twice in history — last wins is the
  * read-the-file-top-to-bottom semantic). Values are trimmed — the
  * shipped `flags = saveall ` and `calibrators_path = … ` lines carry
  * trailing spaces.
  *
  * The `flags` value chains into [[Downsample.parseFlags]] (the
  * decimation-product grammar), `ref_freq_list` into [[NpyFile]] — this
  * loader is the glue that lets a launcher-shaped query (project →
  * flags → decimation plan) run end to end. q145 oracles the parse +
  * override + plan expansion on fabricated config text; the spec reads
  * the real reference files.
  *
  * Scale: configs are a per-project DIM (dozens of rows); [[load]] reads
  * whole files one task each and everything downstream broadcasts.
  */
object ProjectConfig {

  /** Ordered (key, value) pairs; comment/blank/keyless lines skip.
    * Split on the FIRST '='; both sides trimmed; '=' inside the value
    * survives (paths with '=' stay whole). A non-comment line without
    * '=' is not launcher syntax and is skipped (lenient, like a shell
    * sourcing ignores what it can't read — the typed accessors downstream
    * surface missing keys as nulls, which is the loud part). */
  def parseEntries(text: String): Seq[(String, String)] =
    text.linesIterator.flatMap { raw =>
      val l = raw.trim
      if (l.isEmpty || l.startsWith("#")) None
      else {
        val i = l.indexOf('=')
        if (i <= 0) None
        else Some((l.substring(0, i).trim, l.substring(i + 1).trim))
      }
    }.toSeq

  /** Last assignment wins (Seq.toMap keeps the final duplicate). */
  def parse(text: String): Map[String, String] = parseEntries(text).toMap

  /** The launcher vocabulary observed across the shipped project configs
    * (union of keys in configuration_files/project_specific/<star>.config). */
  val KnownKeys: Seq[String] = Seq(
    "user", "type", "pipe", "input_path", "output_path",
    "calibrators_path", "meertime_templates", "meertime_ephemerides",
    "rm_cat", "dm_cat", "flags", "ref_freq_list", "decimation_products",
    "rfi_alg")

  /** Column-level form for fabricated-text oracling (q145): each
    * (id, config-text) row parses to its post-override key/value rows. */
  def parseColumn(df: DataFrame, idCol: String, textCol: String): DataFrame =
    ParseColumn.rows(df, idCol, textCol) { (id, t) =>
      parse(t).toSeq.sortBy(_._1).map { case (k, v) => (id, k, v) }
    }.toDF("cfg_id", "key", "value")

  /** Distributed load: one row per (config file, surviving key) with the
    * project name taken from the file basename. */
  def load(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.read.option("wholetext", "true").textFile(path)
      .withColumn("source_file", input_file_name())
      .as[(String, String)]
      .flatMap { case (txt, f) =>
        val project = f.split('/').last.stripSuffix(".config")
        parse(txt).toSeq.sortBy(_._1).map { case (k, v) => (f, project, k, v) }
      }
      .toDF("source_file", "project", "key", "value")
  }

  /** Wide typed form: one row per project, one column per [[KnownKeys]]
    * member (null when the file doesn't set it). */
  def typed(spark: SparkSession, path: String): DataFrame = {
    val kv = load(spark, path)
    val aggs = KnownKeys.map(k => max(when(col("key") === k, col("value"))).as(k))
    kv.groupBy("source_file", "project").agg(aggs.head, aggs.tail: _*)
  }

  /** Expand a `flags` column through [[Downsample.parseFlags]]: one row
    * per decimation plan (plan-less configs keep one row with null plan
    * columns — left semantics, a config is never silently dropped), plus
    * the sorted non-decimation global flags. The id column keeps its
    * ORIGINAL type (same contract as Bpe.encode's id passthrough). */
  def decimationPlans(df: DataFrame, idCol: String, flagsCol: String): DataFrame = {
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.types._
    val outSchema = StructType(Seq(
      df.schema(idCol),
      StructField("plan", StringType, nullable = true),
      StructField("t_factor", LongType, nullable = true),
      StructField("f_factor", LongType, nullable = true),
      StructField("global_flags", StringType, nullable = true)))
    df.select(col(idCol), col(flagsCol).cast("string"))
      .flatMap({ r =>
        val id = r.get(0)
        val fl = if (r.isNullAt(1)) "" else r.getString(1)
        val (plans, globals) = Downsample.parseFlags(fl)
        val g = globals.toSeq.sorted.mkString(",")
        if (plans.isEmpty) Iterator.single(Row(id, null, null, null, g))
        else plans.iterator.map(p => Row(id, p.name, p.tFactor, p.fFactor, g))
      })(Encoders.row(outSchema))
  }
}
