package graft

import org.apache.spark.sql.functions._

import graft.operators.DelayCorrection

class DelayCorrectionSpec extends SparkSpec {
  import spark.implicits._

  private val config =
    """#Config  header comment
      |* 1K mode base delay
      |mjd > 58526.21089
      |mjd < 70000.0
      |delay += -24.629 us
      |
      |* firmware-specific bump   # trailing comment
      |firmware ~= bluster2k
      |delay += 1.5 us
      |
      |* legacy override window
      |mjd > 58000
      |mjd <= 58100
      |delay = 10 us
      |
      |* excluded backend
      |bename !~= ptuse
      |delay -= 2 ns
      |""".stripMargin

  private val rules = DelayCorrection.parseConfig(config)

  test("parseConfig reads blocks, conditions, units and reset ops (dlyfix.py:27)") {
    assert(rules.map(_.name) == Seq("1K mode base delay", "firmware-specific bump",
      "legacy override window", "excluded backend"))
    assert(math.abs(rules(0).seconds - (-24.629e-6)) < 1e-15)
    assert(rules(1).conds == Seq(DelayCorrection.Cond("firmware", DelayCorrection.Re, "bluster2k")))
    assert(rules(2).reset && math.abs(rules(2).seconds - 10e-6) < 1e-15)
    assert(math.abs(rules(3).seconds - (-2e-9)) < 1e-18)
  }

  test("totalDelay accumulates matching blocks; '=' replaces prior corrections (dlyfix.py:128)") {
    val base = Map("mjd" -> "58600.0", "firmware" -> "bluster2k-v2", "bename" -> "ptuse")
    // base delay + firmware bump; !~= ptuse fails; no reset window
    val got = DelayCorrection.totalDelay(rules, base)
    assert(math.abs(got - (-24.629e-6 + 1.5e-6)) < 1e-15)

    // inside the reset window: '=' replaces everything before it
    val legacy = Map("mjd" -> "58050.0", "firmware" -> "other", "bename" -> "kat")
    val got2 = DelayCorrection.totalDelay(rules, legacy)
    assert(math.abs(got2 - (10e-6 + -2e-9)) < 1e-15) // reset, then the !~= block still adds
  }

  test("attribute unit tokens resolve per-observation like the reference getattr (dlyfix.py:94)") {
    val cfg =
      """* tbin-scaled correction
        |mjd > 58000
        |delay += 2 tbin
        |delay -= 1 us
        |""".stripMargin
    val r = DelayCorrection.parseConfig(cfg)
    assert(r.head.terms.head.unitAttr == Some("tbin"))
    val got = DelayCorrection.totalDelay(r, Map("mjd" -> "58600", "tbin" -> "0.000256"))
    assert(math.abs(got - (2 * 0.000256 - 1e-6)) < 1e-15)
    // distributed path resolves the same attribute column
    val obs = Seq((58600.0, 0.000256), (57000.0, 0.000256)).toDF("mjd", "tbin")
    val out = DelayCorrection.applyTo(obs, r, col)
      .select("delay_correction").as[Double].collect().toSeq
    assert(math.abs(out(0) - (2 * 0.000256 - 1e-6)) < 1e-15)
    assert(out(1) == 0.0)
  }

  test("regex conditions are anchored-prefix even with alternation (python re.match parity)") {
    val cfg =
      """* alt match
        |firmware ~= a|b
        |delay += 1 us
        |""".stripMargin
    val r = DelayCorrection.parseConfig(cfg)
    // 'axx' and 'b9' match re.match('a|b'); 'xb' must NOT (prefix-anchored)
    assert(DelayCorrection.totalDelay(r, Map("firmware" -> "axx")) > 0)
    assert(DelayCorrection.totalDelay(r, Map("firmware" -> "b9")) > 0)
    assert(DelayCorrection.totalDelay(r, Map("firmware" -> "xb")) == 0.0)
    val obs = Seq("axx", "b9", "xb").toDF("firmware")
    val out = DelayCorrection.applyTo(obs, r, col)
      .select("delay_correction").as[Double].collect().toSeq
    assert(out == Seq(1e-6, 1e-6, 0.0))
  }

  test("applyTo matches the scalar path row by row") {
    val obs = Seq(
      (58600.0, "bluster2k-v2", "ptuse"),
      (58050.0, "other", "kat"),
      (57000.0, "x", "ptuse"),
    ).toDF("mjd", "firmware", "bename")
    val out = DelayCorrection.applyTo(obs, rules, name => col(name))
      .select("mjd", "firmware", "bename", "delay_correction")
      .collect()
    out.foreach { r =>
      val props = Map("mjd" -> r.getDouble(0).toString,
        "firmware" -> r.getString(1), "bename" -> r.getString(2))
      val want = DelayCorrection.totalDelay(rules, props)
      assert(math.abs(r.getDouble(3) - want) < 1e-15,
        s"row $props: distributed=${r.getDouble(3)} scalar=$want")
    }
  }
}
