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

  /** One `delay` line. `set` when the line used `=` (which clears
    * everything accumulated before it, dlyfix.py:99); `value` is already
    * signed for `-=`. The unit is either a constant factor (ms/us/ns/none)
    * or an observation *attribute name* resolved per-observation at eval
    * time — the reference treats any other unit token as
    * `conv = float(getattr(self, elems[3]))`, e.g. `delay += 1 tbin`
    * (dlyfix.py:94). */
  final case class DelayTerm(set: Boolean, value: Double, unitFactor: Double,
                             unitAttr: Option[String])

  /** One parsed block: all conds must hold; its delay lines evaluate in
    * order. */
  final case class DelayRule(name: String, conds: Seq[Cond], terms: Seq[DelayTerm]) {
    /** True when any delay line used `=` (replaces prior corrections). */
    def reset: Boolean = terms.exists(_.set)

    /** Net seconds for constant-unit rules (undefined for attribute units,
      * which need an observation). */
    def seconds: Double = {
      require(terms.forall(_.unitAttr.isEmpty),
        s"rule '$name' uses attribute units; evaluate per-observation")
      terms.foldLeft(0.0)((acc, t) => if (t.set) t.value * t.unitFactor
                                      else acc + t.value * t.unitFactor)
    }
  }

  private val unitConv = Map("ms" -> 1e-3, "us" -> 1e-6, "ns" -> 1e-9)

  def parseConfig(text: String): Seq[DelayRule] = {
    val rules = Seq.newBuilder[DelayRule]
    var name = "VOID"
    var conds = Seq.empty[Cond]
    var inBlock = false
    var terms = Seq.empty[DelayTerm]

    def flush(): Unit = {
      if (inBlock && terms.nonEmpty) rules += DelayRule(name, conds, terms)
      conds = Seq.empty; terms = Seq.empty
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
          val (factor, attr) =
            if (elems.length > 3) {
              unitConv.get(elems(3)) match {
                case Some(f) => (f, None)
                case None => (1.0, Some(elems(3))) // attribute unit, per-observation
              }
            } else (1.0, None)
          val sign = if (elems(1) == "-=") -1.0 else 1.0
          terms :+= DelayTerm(elems(1) == "=", sign * elems(2).toDouble, factor, attr)
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

  /** Anchored-prefix regex semantics: python `re.match` matches at the
    * start only, including for patterns with alternation or anchors where
    * appending ".*" would change meaning (e.g. `a|b`). */
  private def reMatch(pattern: String, v: String): Boolean =
    java.util.regex.Pattern.compile(pattern).matcher(v).lookingAt()

  /** Scalar evaluation over one observation's properties (mirrors
    * `getcorrection`, scripts/dlyfix.py:128). Missing attributes referenced
    * by a unit token throw, like the reference's getattr. */
  def totalDelay(rules: Seq[DelayRule], props: Map[String, String]): Double = {
    var total = 0.0
    rules.foreach { r =>
      val ok = r.conds.forall { c =>
        val v = props.getOrElse(c.attr, "")
        c.op match {
          case Re    => reMatch(c.value, v)
          case NotRe => !reMatch(c.value, v)
          case Lt    => v.toDouble < c.value.toDouble
          case Gt    => v.toDouble > c.value.toDouble
          case Le    => v.toDouble <= c.value.toDouble
          case Ge    => v.toDouble >= c.value.toDouble
        }
      }
      if (ok) r.terms.foreach { t =>
        val conv = t.unitAttr match {
          case Some(a) => props(a).toDouble
          case None => t.unitFactor
        }
        val v = t.value * conv
        if (t.set) total = v else total += v
      }
    }
    total
  }

  /** Distributed evaluation: adds `delay_correction` (seconds) from a
    * left-to-right fold of the rules over the row's property columns.
    * Attribute units resolve against the row via `colFor`. The config is
    * tiny, so the fold compiles to one codegen'd when-chain — no join, no
    * shuffle. */
  def applyTo(df: DataFrame, rules: Seq[DelayRule], colFor: String => Column): DataFrame = {
    val total = rules.foldLeft(lit(0.0)) { (acc, r) =>
      val cond = r.conds.map { c =>
        val v = colFor(c.attr)
        c.op match {
          // "^(?:...)": group the pattern so alternation stays anchored,
          // matching python re.match / the scalar lookingAt path.
          case Re    => v.cast("string").rlike("^(?:" + c.value + ")")
          case NotRe => !v.cast("string").rlike("^(?:" + c.value + ")")
          case Lt    => v.cast("double") < c.value.toDouble
          case Gt    => v.cast("double") > c.value.toDouble
          case Le    => v.cast("double") <= c.value.toDouble
          case Ge    => v.cast("double") >= c.value.toDouble
        }
      }.reduceOption(_ && _).getOrElse(lit(true))
      val applied = r.terms.foldLeft(acc) { (tacc, t) =>
        val v = t.unitAttr match {
          case Some(a) => colFor(a).cast("double") * lit(t.value)
          case None => lit(t.value * t.unitFactor)
        }
        if (t.set) v else tacc + v
      }
      when(cond, applied).otherwise(acc)
    }
    df.withColumn("delay_correction", total)
  }
}
