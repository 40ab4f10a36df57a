package graft.multimodal

/** Perceptual audio fingerprinting — the audio end of the dedup
  * pipeline, mirroring [[ImageHash]]: a 64-bit fingerprint per clip such
  * that the same recording re-encoded (bit depth, container, volume
  * change) lands within a small Hamming distance while different
  * recordings land ~32 bits apart; downstream it feeds the same
  * [[graft.operators.Dedup.hammingPairs]] banded join as image and text
  * fingerprints.
  *
  * Construction: channel-0 PCM energy in 256-sample blocks (one
  * streaming decode pass, 8 bytes of state per block), blocks regrouped
  * into 64 equal-count segments, bit k = energy(segment k) >
  * energy(segment k−1) (bit 0 compares segment 0 to the clip mean).
  * Energy-DELTA signs are invariant to volume scaling (a gain multiplies
  * every segment equally, preserving every comparison) and robust to
  * re-quantization noise, the same reasoning as dHash's gradient signs.
  * Decoding rides the JDK (`javax.sound.sampled`, WAV/AIFF/AU in a stock
  * JVM) with non-PCM-16 encodings converted like
  * [[Multimodal.AudioCodec.decode]]. */
object AudioHash {

  private val BlockSamples = 256
  private val Segments = 64

  /** Per-256-sample channel-0 energies in one streaming pass; None when
    * no JDK reader recognizes the container or the clip is shorter than
    * one block per segment (64·256 samples ≈ 0.37 s at 44.1 kHz — below
    * that there is no meaningful temporal structure to fingerprint). */
  private[multimodal] def blockEnergies(payload: Array[Byte]): Option[Array[Double]] =
    try {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val src = ais.getFormat
        val target = new javax.sound.sampled.AudioFormat(
          javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
          src.getSampleRate, 16, src.getChannels, src.getChannels * 2,
          src.getSampleRate, false)
        val pcm =
          if (src.matches(target)) ais
          else javax.sound.sampled.AudioSystem.getAudioInputStream(target, ais)
        val ch = src.getChannels
        val buf = new Array[Byte](8192 - (8192 % (2 * ch)))
        val energies = scala.collection.mutable.ArrayBuffer.empty[Double]
        var acc = 0.0
        var inBlock = 0
        var read = pcm.read(buf)
        while (read > 0) {
          var i = 0
          while (i + 1 < read) {
            val s = ((buf(i) & 0xff) | (buf(i + 1) << 8)).toShort / 32768.0
            acc += s * s
            inBlock += 1
            if (inBlock == BlockSamples) { energies += acc; acc = 0.0; inBlock = 0 }
            i += 2 * ch
          }
          read = pcm.read(buf)
        }
        if (energies.size < Segments) None else Some(energies.toArray)
      } finally ais.close()
    } catch { case _: Exception => None }

  /** 64-bit energy-delta fingerprint; None when the payload doesn't
    * decode or is too short (< 64 blocks of 256 samples). */
  def fingerprint(payload: Array[Byte]): Option[Long] =
    blockEnergies(payload).map { blocks =>
      val nb = blocks.length
      // 64 equal-count segments over the block sequence (integer
      // boundaries, every block in exactly one segment)
      val seg = new Array[Double](Segments)
      var k = 0
      while (k < Segments) {
        val b0 = (k.toLong * nb / Segments).toInt
        val b1 = ((k + 1).toLong * nb / Segments).toInt
        var s = 0.0
        var b = b0
        while (b < b1) { s += blocks(b); b += 1 }
        seg(k) = s / (b1 - b0)
        k += 1
      }
      val mean = seg.sum / Segments
      var bits = 0L
      k = 0
      while (k < Segments) {
        val ref = if (k == 0) mean else seg(k - 1)
        if (seg(k) > ref) bits |= 1L << (63 - k)
        k += 1
      }
      bits
    }

  /** Hamming distance between two fingerprints. */
  def distance(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
}
