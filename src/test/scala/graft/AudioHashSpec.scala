package graft

import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

import graft.multimodal.AudioHash
import graft.operators.Dedup

/** Perceptual audio fingerprinting (AudioHash): volume invariance,
  * re-quantization robustness, distinct-signal separation, short-clip
  * refusal, and composition with the banded Hamming dedup. */
class AudioHashSpec extends SparkSpec {
  import spark.implicits._

  /** Deterministic "music-like" signal: piecewise segments whose
    * amplitude follows a pseudo-random walk (hash-derived, no RNG state),
    * so the 64-segment energy profile has real structure. */
  private def signal(nSamples: Int, seed: Int, gain: Double = 0.5): Array[Short] = {
    val out = new Array[Short](nSamples)
    var i = 0
    while (i < nSamples) {
      val seg = i / 1024
      // nonlinear mix so different seeds give unrelated walks (an affine
      // seed term only rotates the h % 1000 sequence)
      val z = (seg.toLong + seed.toLong * 1000003L) * -0x61c8864680b583ebL
      val h = (z ^ (z >>> 29)) & 0x7fffffff
      val amp = 0.15 + 0.8 * ((h % 1000) / 999.0)
      val freq = 100.0 + (h % 37) * 60.0
      val s = amp * gain * math.sin(2 * math.Pi * freq * i / 16000.0)
      out(i) = (s * 32767).toShort
      i += 1
    }
    out
  }

  private def wav(samples: Array[Short], rate: Float = 16000f): Array[Byte] = {
    val bytes = new Array[Byte](samples.length * 2)
    var i = 0
    while (i < samples.length) {
      bytes(2 * i) = (samples(i) & 0xff).toByte
      bytes(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new AudioFormat(rate, 16, 1, true, false)
    val ais = new AudioInputStream(
      new java.io.ByteArrayInputStream(bytes), fmt, samples.length.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  private val n = 16000 * 4 // 4 s at 16 kHz

  test("fingerprint is deterministic and VOLUME-INVARIANT (energy-delta signs)") {
    val base = AudioHash.fingerprint(wav(signal(n, seed = 1))).get
    assert(AudioHash.fingerprint(wav(signal(n, seed = 1))).get === base)
    val quiet = AudioHash.fingerprint(wav(signal(n, seed = 1, gain = 0.2))).get
    val loud = AudioHash.fingerprint(wav(signal(n, seed = 1, gain = 0.9))).get
    // scaling multiplies every segment energy equally: small distance
    // (quantization noise can flip a near-tie bit, never the structure)
    assert(AudioHash.distance(base, quiet) <= 4, s"quiet dist ${AudioHash.distance(base, quiet)}")
    assert(AudioHash.distance(base, loud) <= 4, s"loud dist ${AudioHash.distance(base, loud)}")
  }

  test("distinct recordings land far apart") {
    val a = AudioHash.fingerprint(wav(signal(n, seed = 1))).get
    val b = AudioHash.fingerprint(wav(signal(n, seed = 2))).get
    assert(AudioHash.distance(a, b) >= 12, s"dist ${AudioHash.distance(a, b)}")
  }

  test("clips shorter than 64 blocks refuse to fingerprint (None, never garbage)") {
    assert(AudioHash.fingerprint(wav(signal(4096, seed = 1))).isEmpty)
    assert(AudioHash.fingerprint(Array[Byte](1, 2, 3, 4)).isEmpty)
  }

  test("end to end: decode WAV payloads -> fingerprint column -> near-dup drop") {
    val items = Seq(
      (1L, wav(signal(n, seed = 1))),
      (2L, wav(signal(n, seed = 1, gain = 0.25))), // same recording, re-leveled
      (3L, wav(signal(n, seed = 9))),              // different recording
    ).toDF("id", "payload")
    val hashed = items.as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) => AudioHash.fingerprint(bytes).map(id -> _) }
      .toDF("id", "fp")
    val kept = Dedup.dedupCorpusByHammingHash(hashed, "fp", "id", maxDist = 3, bands = 4)
      .select("id").as[Long].collect().toSet
    assert(kept === Set(1L, 3L))
  }
}
