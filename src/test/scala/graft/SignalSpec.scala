package graft

import org.apache.spark.sql.functions._

import graft.functions.Signal

class SignalSpec extends SparkSpec {
  import spark.implicits._

  test("bandOf buckets values into configured bands") {
    val df = Seq(10.0, 75.0, 200.0, 300.0, 450.0, 600.0).toDF("v")
      .withColumn("band", Signal.bandOf(col("v")))
    val got = df.select("band").as[String].collect().toSeq
    assert(got == Seq("UHF", "LBAND", "SBAND_0", "SBAND_1", "SBAND_2", "UNKNOWN"))
  }

  test("insideChop keeps only inner band ranges") {
    val df = Seq(2.0, 10.0, 49.0, 70.0, 145.0).toDF("v")
      .withColumn("keep", Signal.insideChop(col("v")))
    assert(df.select("keep").as[Boolean].collect().toSeq ==
      Seq(false, true, false, true, false))
  }

  test("maxNsub matches the reference formula (calc_max_nsub.py:4)") {
    // Reference semantics: sn_chan = sn/sqrt(nchan); est = dur*(12/sn_chan)^2,
    // clamped to >=480; nsub = floor(dur/est) capped at input_nsub.
    def ref(sn: Double, nchan: Double, dur: Double, inputNsub: Long): Long = {
      val snChan = sn / math.sqrt(nchan)
      val est = math.max(dur * math.pow(12.0 / snChan, 2), 480.0)
      math.min(math.floor(dur / est).toLong, inputNsub)
    }
    val cases = Seq((100.0, 16.0, 7200.0, 60L), (20.0, 16.0, 3600.0, 16L), (400.0, 1.0, 960.0, 4L))
    val df = cases.toDF("sn", "nchan", "dur", "input")
      .withColumn("nsub", Signal.maxNsub(col("sn"), col("nchan"), col("dur"), col("input")).cast("long"))
    val got = df.select("nsub").as[Long].collect().toSeq
    assert(got == cases.map(c => ref(c._1, c._2, c._3, c._4)))
  }

  test("ssys implements (SEFD + Tsky)/Nant (fluxcal_meerkat.py:258)") {
    val df = Seq((390.0, 15.2, 60.0)).toDF("sefd", "tsky", "nant")
      .withColumn("s", Signal.ssys(col("sefd"), col("tsky"), col("nant")))
    assert(math.abs(df.select("s").as[Double].head() - (390.0 + 15.2) / 60.0) < 1e-12)
  }

  test("radiometerRms implements the radiometer equation") {
    val df = Seq((400.0, 800.0, 16.0, 3600.0, 1024.0)).toDF("ssys", "bw", "nchan", "tobs", "nbin")
      .withColumn("rms", Signal.radiometerRms(col("ssys"), col("bw"), col("nchan"), col("tobs"), col("nbin")))
    val got = df.select("rms").as[Double].head()
    val want = 400.0 / math.sqrt(2.0 * 800.0 / 16.0 * 3600.0 / 1024.0)
    assert(math.abs(got - want) < 1e-12)
  }

  test("zapFraction counts predicate fraction exactly") {
    val df = Seq(0.0, 0.0, 1.0, 2.0).toDF("v")
    val got = df.agg(Signal.zapFraction(col("v") === 0.0)).as[Double].head()
    assert(got == 0.5)
  }

  test("alignShift + rotateProfile put the argmax at the phase-0.5 bin") {
    // Hand-computed: n=8, argmax index 1 (0-based), target bin 4 →
    // left-rotate by (2-5 mod 8)=5; after rotation the max sits at index 4.
    val profiles = Seq(
      Seq(1.0, 9.0, 2.0, 3.0, 0.0, 4.0, 5.0, 6.0), // even n, interior max
      Seq(7.0, 1.0, 2.0, 3.0, 4.0),                // odd n, max at index 0
      Seq(2.0, 2.0, 5.0, 5.0),                     // tie → FIRST argmax (ref .argmax())
    )
    val df = profiles.toDF("p")
      .withColumn("s", Signal.alignShift(col("p")))
      .withColumn("r", Signal.rotateProfile(col("p"), col("s")))
    val rows = df.select("s", "r").as[(Long, Seq[Double])].collect().toSeq
    rows.foreach { case (_, r) =>
      val mid = r.size / 2
      assert(r(mid) == r.max, s"argmax not centered in $r")
    }
    // Rotation is a permutation: multiset preserved, explicit value check.
    assert(rows.head._2 == Seq(4.0, 5.0, 6.0, 1.0, 9.0, 2.0, 3.0, 0.0))
    assert(rows.head._1 == 5L)
    // Tie case: first argmax (index 2) lands at mid, not the later one.
    assert(rows(2)._2 == Seq(2.0, 2.0, 5.0, 5.0))
  }

  test("minMaxNormalize maps to [0,1]; flat profile maps to zeros") {
    val df = Seq(Seq(2.0, 4.0, 6.0), Seq(3.0, 3.0, 3.0)).toDF("p")
      .withColumn("n", Signal.minMaxNormalize(col("p")))
    val got = df.select("n").as[Seq[Double]].collect().toSeq
    assert(got(0) == Seq(0.0, 0.5, 1.0))
    assert(got(1) == Seq(0.0, 0.0, 0.0))
  }

  test("linearPol and scaleProfile implement sqrt(Q^2+U^2) and 1/m scaling") {
    val df = Seq((Seq(3.0, 0.0), Seq(4.0, 2.0))).toDF("q", "u")
      .withColumn("l", Signal.linearPol(col("q"), col("u")))
      .withColumn("sc", Signal.scaleProfile(col("l"), lit(2.0)))
    val (l, sc) = df.select("l", "sc").as[(Seq[Double], Seq[Double])].head()
    assert(l == Seq(5.0, 2.0))
    assert(sc == Seq(2.5, 1.0))
  }

  test("ToaSelect: first-match-wins, default accept, loud failures") {
    import graft.operators.ToaSelect
    val rules = ToaSelect.parse(
      """# comment
        |LOGIC -snr < 2 ACCEPT
        |LOGIC -snr < 10 REJECT
        |""".stripMargin)
    assert(rules === Seq(
      ToaSelect.Rule("snr", "<", 2.0, accept = true),
      ToaSelect.Rule("snr", "<", 10.0, accept = false)))
    val df = Seq((1L, Some(1.0)), (2L, Some(5.0)), (3L, Some(50.0)), (4L, None))
      .toDF("id", "snr")
    val kept = ToaSelect.filter(df, rules, Map("snr" -> col("snr")))
      .select("id").as[Long].collect().toSet
    // 1.0 hits the ACCEPT carve-out before the REJECT rule; 5.0 rejects;
    // 50.0 matches nothing -> default accept; null satisfies no
    // comparison -> default accept
    assert(kept === Set(1L, 3L, 4L))
    intercept[IllegalArgumentException](ToaSelect.parse("LOGIC snr oops"))
    intercept[IllegalArgumentException](
      ToaSelect.filter(df, rules, Map("other" -> col("snr"))))
  }
}
