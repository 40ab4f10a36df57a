package graft

import org.apache.spark.sql.functions._

import graft.operators.PolnCal

/** Jones-matrix polarisation calibration (PolnCal.applyJones): identity
  * no-op, forward-distort → calibrate round trip, a hand-computed gain
  * case, null Stokes propagation, and missing-calibration keys. */
class PolnCalSpec extends SparkSpec {
  import spark.implicits._

  private def jonesRow(ch: Long,
                       j00: (Double, Double), j01: (Double, Double),
                       j10: (Double, Double), j11: (Double, Double)) =
    (ch, j00._1, j00._2, j01._1, j01._2, j10._1, j10._2, j11._1, j11._2)

  private val jonesCols =
    Seq("channel") ++ PolnCal.jonesColumns("j")

  private val stokes = Seq(
    (0L, 0L, 10.0, 3.0, 2.0, 1.0),
    (1L, 0L, 5.0, -1.0, 0.5, -0.25),
    (2L, 1L, 8.0, 0.0, 4.0, 2.0),
  ).toDF("id", "channel", "stokes_i", "stokes_q", "stokes_u", "stokes_v")

  test("identity Jones is a no-op in both directions") {
    val ident = Seq(
      jonesRow(0L, (1, 0), (0, 0), (0, 0), (1, 0)),
      jonesRow(1L, (1, 0), (0, 0), (0, 0), (1, 0)),
    ).toDF(jonesCols: _*)
    for (inv <- Seq(true, false)) {
      val out = PolnCal.applyJones(stokes, ident, Seq("channel"), invert = inv)
        .select("stokes_i", "stokes_q", "stokes_u", "stokes_v",
          "stokes_i_cal", "stokes_q_cal", "stokes_u_cal", "stokes_v_cal")
        .collect()
      out.foreach { r =>
        (0 until 4).foreach(c =>
          assert(math.abs(r.getDouble(c) - r.getDouble(c + 4)) < 1e-12,
            s"invert=$inv col=$c row=$r"))
      }
    }
  }

  test("pure gain J = diag(2, 1) forward: I' = (5I+3Q)/2, Q' = (3I+5Q)/2, U' = 2U, V' = 2V") {
    val gain = Seq(jonesRow(0L, (2, 0), (0, 0), (0, 0), (1, 0))).toDF(jonesCols: _*)
    val out = PolnCal.applyJones(stokes.filter(col("channel") === 0), gain,
        Seq("channel"), invert = false)
      .select("stokes_i", "stokes_q", "stokes_u", "stokes_v",
        "stokes_i_cal", "stokes_q_cal", "stokes_u_cal", "stokes_v_cal")
      .collect()
    out.foreach { r =>
      val (i, q, u, v) = (r.getDouble(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))
      assert(math.abs(r.getDouble(4) - (5 * i + 3 * q) / 2) < 1e-12)
      assert(math.abs(r.getDouble(5) - (3 * i + 5 * q) / 2) < 1e-12)
      assert(math.abs(r.getDouble(6) - 2 * u) < 1e-12)
      assert(math.abs(r.getDouble(7) - 2 * v) < 1e-12)
    }
  }

  test("distort with a full complex J, calibrate with the same J: round trip") {
    // gains, phases, and cross-leakage all non-trivial
    val j = Seq(
      jonesRow(0L, (1.05, 0.08), (0.04, -0.02), (-0.03, 0.05), (0.97, -0.06)),
      jonesRow(1L, (0.93, -0.11), (-0.06, 0.01), (0.05, 0.02), (1.08, 0.09)),
    ).toDF(jonesCols: _*)
    val distorted = PolnCal.applyJones(stokes, j, Seq("channel"),
        invert = false, outSuffix = "_m")
      .select(col("id"), col("channel"),
        col("stokes_i").as("i0"), col("stokes_q").as("q0"),
        col("stokes_u").as("u0"), col("stokes_v").as("v0"),
        col("stokes_i_m").as("stokes_i"), col("stokes_q_m").as("stokes_q"),
        col("stokes_u_m").as("stokes_u"), col("stokes_v_m").as("stokes_v"))
    val back = PolnCal.applyJones(distorted, j, Seq("channel"), invert = true)
      .select("i0", "q0", "u0", "v0",
        "stokes_i_cal", "stokes_q_cal", "stokes_u_cal", "stokes_v_cal")
      .collect()
    assert(back.length === 3)
    back.foreach { r =>
      (0 until 4).foreach(c =>
        assert(math.abs(r.getDouble(c) - r.getDouble(c + 4)) < 1e-10,
          s"round trip col=$c row=$r"))
    }
  }

  test("null Stokes propagates; a channel with no Jones row keeps the row with null cal") {
    val j = Seq(jonesRow(0L, (1.1, 0.02), (0.01, 0.0), (0.0, -0.01), (0.9, 0.0)))
      .toDF(jonesCols: _*)
    val withNull = Seq(
      (0L, 0L, Some(10.0), Some(3.0), Some(2.0), Option.empty[Double]),
      (1L, 9L, Some(5.0), Some(1.0), Some(0.5), Some(0.25)), // channel 9: no cal
    ).toDF("id", "channel", "stokes_i", "stokes_q", "stokes_u", "stokes_v")
    val out = PolnCal.applyJones(withNull, j, Seq("channel"))
      .select("id", "stokes_i_cal", "stokes_v_cal").collect()
      .map(r => r.getLong(0) -> (r.isNullAt(1), r.isNullAt(2))).toMap
    // null V poisons every calibrated component (ρ couples them)
    assert(out(0L) === ((true, true)))
    // missing calibration: row kept, calibrated values null
    assert(out(1L) === ((true, true)))
  }

  test("a singular Jones matrix calibrates to null, never NaN/Infinity") {
    // rank-1: second row = first row (det = 0), plus an all-zero matrix
    val singular = Seq(
      jonesRow(0L, (1.0, 0.5), (0.2, -0.1), (1.0, 0.5), (0.2, -0.1)),
      jonesRow(1L, (0, 0), (0, 0), (0, 0), (0, 0)),
    ).toDF(jonesCols: _*)
    val out = PolnCal.applyJones(stokes, singular, Seq("channel"), invert = true)
      .select("id", "stokes_i_cal", "stokes_q_cal", "stokes_u_cal", "stokes_v_cal")
      .collect()
    assert(out.length === 3)
    out.foreach(r => (1 to 4).foreach(c =>
      assert(r.isNullAt(c), s"row $r col $c must be null, not NaN")))
    // forward application of the same singular J is well-defined (no inverse)
    val fwd = PolnCal.applyJones(stokes.filter(col("channel") === 0), singular,
        Seq("channel"), invert = false)
      .select("stokes_i_cal").collect()
    fwd.foreach(r => assert(!r.isNullAt(0) && !r.getDouble(0).isNaN))
  }

  test("near-singular Jones passes the default exact-0 guard but nulls under singularEps2") {
    // det = 1e-8·(scale of the matrix): numerically near-singular
    val nearSing = Seq(
      jonesRow(0L, (1.0, 0.0), (1.0, 0.0), (1.0, 0.0), (1.0 + 1e-8, 0.0)),
      jonesRow(1L, (1.0, 0.0), (0.0, 0.0), (0.0, 0.0), (1.0, 0.0)),
    ).toDF(jonesCols: _*)
    // default: exact-0 semantics — the near-singular channel calibrates
    // to huge but non-null values (the documented contract)
    val loose = PolnCal.applyJones(stokes, nearSing, Seq("channel"))
      .filter(col("channel") === 0).select("stokes_i_cal").collect()
    loose.foreach(r => assert(!r.isNullAt(0)))
    // with a |det|² threshold the channel is treated as dead (null),
    // while the well-conditioned channel still calibrates
    val strict = PolnCal.applyJones(stokes, nearSing, Seq("channel"),
        singularEps2 = 1e-12)
      .select("channel", "stokes_i_cal").collect()
    strict.foreach { r =>
      if (r.getLong(0) == 0L) assert(r.isNullAt(1), s"near-singular channel must null: $r")
      else assert(!r.isNullAt(1) && !r.getDouble(1).isNaN)
    }
  }
}
