package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** TOA selection-logic rules — the reference's `.select` config format
  * (default_toa_logic.select: `LOGIC -snr < 10 REJECT`), the last
  * config-file surface the pipeline ships: quality rules that accept or
  * reject timing observations by attribute thresholds before they reach
  * the timing fit.
  *
  * Grammar (one rule per line, `#` comments):
  * {{{ LOGIC -<attr> <op> <value> ACCEPT|REJECT }}}
  * with op ∈ {<, <=, >, >=, =, !=}. Rules evaluate IN ORDER; the first
  * whose condition holds decides the row, rows matching no rule are
  * ACCEPTED (the reference's default-keep convention — rules exist to
  * carve out rejections). A null attribute satisfies no comparison, so
  * null rows fall through to the default like in any SQL engine.
  *
  * Execution is a codegen'd `when`-chain over plain Column comparisons
  * (same shape as [[DelayCorrection]]'s dlycfg chain) — a pure map
  * stage, no UDF, no shuffle, pushdown-safe.
  */
object ToaSelect {

  final case class Rule(attr: String, op: String, value: Double, accept: Boolean)

  // value = a proper numeric literal, so a malformed number ("1.2.3")
  // falls to the loud unparseable-rule error instead of escaping as a
  // bare NumberFormatException from toDouble
  private val Line =
    """(?i)LOGIC\s+-(\w+)\s*(<=|>=|!=|=|<|>)\s*([-+]?(?:\d+\.?\d*|\.\d+)(?:[eE][-+]?\d+)?)\s+(ACCEPT|REJECT)""".r

  /** Parse a `.select` file's text. Unparseable non-comment lines throw
    * (a silently-skipped quality rule would admit bad TOAs). */
  def parse(text: String): Seq[Rule] =
    text.linesIterator
      .map(_.trim)
      .filter(l => l.nonEmpty && !l.startsWith("#"))
      .map {
        case Line(attr, op, v, verdict) =>
          Rule(attr.toLowerCase, op, v.toDouble, verdict.equalsIgnoreCase("ACCEPT"))
        case bad =>
          throw new IllegalArgumentException(s"unparseable .select rule: '$bad'")
      }
      .toSeq

  private def cond(r: Rule, attr: Column): Column = r.op match {
    case "<"  => attr < r.value
    case "<=" => attr <= r.value
    case ">"  => attr > r.value
    case ">=" => attr >= r.value
    case "="  => attr === r.value
    case "!=" => attr =!= r.value
  }

  /** Boolean keep column: first matching rule decides, default ACCEPT.
    * `attrs` maps rule attribute names (lowercase) to the columns that
    * carry them; referencing an unmapped attribute throws at plan time
    * (loud, not a silent always-false rule). */
  def keepColumn(rules: Seq[Rule], attrs: Map[String, Column]): Column = {
    val chain = rules.foldLeft(Option.empty[Column]) { (acc, r) =>
      val a = attrs.getOrElse(r.attr, throw new IllegalArgumentException(
        s"rule references unmapped attribute '${r.attr}' (have: ${attrs.keys.mkString(", ")})"))
      val c = cond(r, a)
      Some(acc.fold(when(c, lit(r.accept)))(_.when(c, lit(r.accept))))
    }
    chain.fold(lit(true))(_.otherwise(lit(true)))
  }

  /** Rows surviving the rules (the reference pipeline's use: drop
    * rejected TOAs before the fit). */
  def filter(df: DataFrame, rules: Seq[Rule], attrs: Map[String, Column]): DataFrame =
    df.filter(keepColumn(rules, attrs))
}
