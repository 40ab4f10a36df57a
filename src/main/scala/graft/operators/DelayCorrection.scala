package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Instrument delay-correction rules — the engine-level form of dlyfix's
  * config format and matching (`history_class.parse`, scripts/dlyfix.py:27;
  * `getcorrection`, scripts/dlyfix.py:128).
  *
  * Config format: blocks opened by `* name`; condition lines
  * `attr op value` with ops `~=` `!~=` `<` `>` `<=` `>=` against
  * observation properties (mjd, beconfig, bename, tbin, firmware, freq);
  * `delay =|+=|-= val [ms|us|ns]` lines; `#` comments. A block matches
  * when all its conditions hold; matching blocks' delays accumulate, and a
  * block whose delay line uses `=` replaces everything accumulated before
  * it (the reference clears its corrections list).
  */
object DelayCorrection {

  sealed trait Op
  case object Lt extends Op
  case object Gt extends Op
  case object Le extends Op
  case object Ge extends Op
  case object Re extends Op
  case object NotRe extends Op

  final case class Cond(attr: String, op: Op, value: String)

  /** One parsed block: all conds must hold; `reset` when its delay line
    * used `=`; `seconds` is the block's net delay. */
  final case class DelayRule(name: String, conds: Seq[Cond], reset: Boolean, seconds: Double)

  private val unitConv = Map("ms" -> 1e-3, "us" -> 1e-6, "ns" -> 1e-9)

  def parseConfig(text: String): Seq[DelayRule] = {
    val rules = Seq.newBuilder[DelayRule]
    var name = "VOID"
    var conds = Seq.empty[Cond]
    var inBlock = false
    var delay = 0.0
    var reset = false
    var sawDelay = false

    def flush(): Unit = {
      if (inBlock && sawDelay) rules += DelayRule(name, conds, reset, delay)
      conds = Seq.empty; delay = 0.0; reset = false; sawDelay = false
    }

    text.linesIterator.foreach { raw =>
      val line = raw.split("#")(0)
      val elems = line.trim.split("\\s+").filter(_.nonEmpty)
      if (elems.nonEmpty) {
        if (elems(0) == "*") {
          flush()
          name = line.trim.stripPrefix("*").trim
          inBlock = true
        } else if (inBlock && elems.length >= 3 && elems(0) == "delay" &&
            Seq("=", "+=", "-=").contains(elems(1))) {
          val conv = if (elems.length > 3) unitConv.getOrElse(elems(3), 1.0) else 1.0
          val v = elems(2).toDouble * conv
          elems(1) match {
            case "="  => delay = v; reset = true
            case "+=" => delay += v
            case "-=" => delay -= v
          }
          sawDelay = true
        } else if (inBlock && elems.length >= 3) {
          val op = elems(1) match {
            case "~="  => Some(Re)
            case "!~=" => Some(NotRe)
            case "<"   => Some(Lt)
            case ">"   => Some(Gt)
            case "<="  => Some(Le)
            case ">="  => Some(Ge)
            case _     => None
          }
          op.foreach(o => conds :+= Cond(elems(0), o, elems(2)))
        }
      }
    }
    flush()
    rules.result()
  }

  /** Scalar evaluation over one observation's properties (mirrors
    * `getcorrection`, scripts/dlyfix.py:128). */
  def totalDelay(rules: Seq[DelayRule], props: Map[String, String]): Double = {
    var total = 0.0
    rules.foreach { r =>
      val ok = r.conds.forall { c =>
        val v = props.getOrElse(c.attr, "")
        c.op match {
          case Re    => v.matches(c.value + ".*") // python re.match = anchored prefix
          case NotRe => !v.matches(c.value + ".*")
          case Lt    => v.toDouble < c.value.toDouble
          case Gt    => v.toDouble > c.value.toDouble
          case Le    => v.toDouble <= c.value.toDouble
          case Ge    => v.toDouble >= c.value.toDouble
        }
      }
      if (ok) { if (r.reset) total = r.seconds else total += r.seconds }
    }
    total
  }

  /** Distributed evaluation: adds `delay_correction` (seconds) from a
    * left-to-right fold of the rules over the row's property columns.
    * The config is tiny, so the fold compiles to one codegen'd
    * when-chain — no join, no shuffle. */
  def applyTo(df: DataFrame, rules: Seq[DelayRule], colFor: String => Column): DataFrame = {
    val total = rules.foldLeft(lit(0.0)) { (acc, r) =>
      val cond = r.conds.map { c =>
        val v = colFor(c.attr)
        c.op match {
          case Re    => v.cast("string").rlike("^" + c.value)
          case NotRe => !v.cast("string").rlike("^" + c.value)
          case Lt    => v.cast("double") < c.value.toDouble
          case Gt    => v.cast("double") > c.value.toDouble
          case Le    => v.cast("double") <= c.value.toDouble
          case Ge    => v.cast("double") >= c.value.toDouble
        }
      }.reduceOption(_ && _).getOrElse(lit(true))
      if (r.reset) when(cond, lit(r.seconds)).otherwise(acc)
      else when(cond, acc + lit(r.seconds)).otherwise(acc)
    }
    df.withColumn("delay_correction", total)
  }
}
