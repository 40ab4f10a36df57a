package graft

import org.apache.spark.sql.functions._

import graft.operators.Toa

/** Template-matching TOA estimation: planted circular shifts must be
  * recovered exactly at integer lags (circular autocorrelation is
  * symmetric, so the parabolic δ vanishes) and bracketed at half-bin
  * lags. */
class ToaSpec extends SparkSpec {

  private val tmpl = Seq(0.0, 1.0, 8.0, 3.0, 1.0, 0.0, 0.0, 0.0)
  private def rot(a: Seq[Double], s: Int): Seq[Double] =
    a.indices.map(i => a(((i - s) % a.length + a.length) % a.length))

  test("integer planted shift is recovered exactly") {
    val s = spark
    import s.implicits._
    val rows = (0 until 8).map(k => (k.toLong, rot(tmpl, k), tmpl))
    val df = rows.toDF("obs_id", "profile", "template")
      .withColumn("epoch_us", lit(1000000L))
      .withColumn("period_us", lit(2000000.0))
    val out = Toa.estimate(df, col("profile"), col("template"),
        col("epoch_us"), col("period_us"))
      .select("obs_id", "k_peak", "shift_bins", "phase", "toa_us")
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))))
      .toMap
    (0 until 8).foreach { k =>
      val (kp, shift, phase, toa) = out(k.toLong)
      assert(kp === k.toLong, s"k_peak for planted shift $k")
      assert(shift === k.toDouble, s"parabolic delta must vanish at lag $k")
      val expPhase = if (k > 4) (k - 8) / 8.0 else k / 8.0
      assert(phase === expPhase)
      assert(toa === 1000000L + expPhase * 2000000.0)
    }
  }

  test("half-bin planted shift lands between the bracketing lags") {
    val s = spark
    import s.implicits._
    val half = rot(tmpl, 2).zip(rot(tmpl, 3)).map { case (a, b) => 0.5 * (a + b) }
    val df = Seq((1L, half, tmpl)).toDF("obs_id", "profile", "template")
      .withColumn("epoch_us", lit(0L))
      .withColumn("period_us", lit(8000000.0))
    val r = Toa.estimate(df, col("profile"), col("template"),
      col("epoch_us"), col("period_us")).select("k_peak", "shift_bins").head()
    assert(r.getLong(0) === 2L)
    val shift = r.getDouble(1)
    assert(shift > 2.0 && shift < 3.0, s"sub-bin shift $shift should bracket 2.5")
  }

  test("flat ccf degenerates to delta 0, not NaN") {
    val s = spark
    import s.implicits._
    val flat = Seq.fill(8)(1.0)
    val df = Seq((1L, flat, flat)).toDF("obs_id", "profile", "template")
      .withColumn("epoch_us", lit(0L)).withColumn("period_us", lit(1.0))
    val r = Toa.estimate(df, col("profile"), col("template"),
      col("epoch_us"), col("period_us")).select("shift_bins").head()
    assert(r.getDouble(0) === 0.0)
  }
}
