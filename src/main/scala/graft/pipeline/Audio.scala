package graft.pipeline

import java.io.ByteArrayInputStream
import java.nio.{ByteBuffer, ByteOrder}

import javax.sound.sampled.AudioSystem

/** Real audio codec operations on the JDK's built-in WAV support
  * (javax.sound.sampled, headless-safe): executor-side kernels for the
  * audio modality, mirroring [[Images]] for PNG. Payloads are genuine
  * RIFF/WAVE files; decode goes through the real parser. */
object Audio {

  /** Deterministic 16-bit mono PCM WAV: a sine at `freqHz` with amplitude
    * `amp` ∈ (0,1], `n` samples at `sampleRate`. */
  def synthWav(freqHz: Double, amp: Double, n: Int,
      sampleRate: Int = 8000): Array[Byte] = {
    val dataLen = n * 2
    val bb = ByteBuffer.allocate(44 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(1) // mono
      .putInt(sampleRate)
      .putInt(sampleRate * 2) // byte rate
      .putShort(2) // block align
      .putShort(16) // bits per sample
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    var i = 0
    while (i < n) {
      val v = amp * math.sin(2.0 * math.Pi * freqHz * i / sampleRate)
      bb.putShort(math.round(v * Short.MaxValue).toShort)
      i += 1
    }
    bb.array()
  }

  /** Three-sine "chord" WAV whose component frequencies derive from the
    * seed (each lands in a different log-spaced analysis band of
    * [[afp64]]) — different seeds occupy different band patterns, so
    * fingerprints separate; gain/time edits of one seed stay close. */
  def chordWav(seed: Long, n: Int, sampleRate: Int = 8000): Array[Byte] = {
    val f1 = bandCenter((seed % 4).toInt)            // low band
    val f2 = bandCenter(3 + ((seed / 4) % 3).toInt)  // mid band
    val f3 = bandCenter(6 + ((seed / 12) % 3).toInt) // high band
    val dataLen = n * 2
    val bb = ByteBuffer.allocate(44 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(sampleRate).putInt(sampleRate * 2)
      .putShort(2).putShort(16)
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    var i = 0
    while (i < n) {
      val t = i.toDouble / sampleRate
      val v = 0.3 * math.sin(2 * math.Pi * f1 * t) +
        0.25 * math.sin(2 * math.Pi * f2 * t) +
        0.2 * math.sin(2 * math.Pi * f3 * t)
      bb.putShort(math.round(v * Short.MaxValue).toShort)
      i += 1
    }
    bb.array()
  }

  /** Re-encode with every sample scaled by `gain` (clamped) — the volume
    * edit near-duplicate fixture. */
  def gainWav(bytes: Array[Byte], gain: Double): Array[Byte] = {
    val (samples, rate) = pcmSamples(bytes)
    val dataLen = samples.length * 2
    val bb = ByteBuffer.allocate(44 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(rate).putInt(rate * 2)
      .putShort(2).putShort(16)
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach { s =>
      val v = math.max(-1.0, math.min(1.0, s * gain))
      bb.putShort(math.round(v * Short.MaxValue).toShort)
    }
    bb.array()
  }

  private def pcmSamples(bytes: Array[Byte]): (Array[Double], Int) = {
    val in = AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
    try {
      val fmt = in.getFormat
      require(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1,
        s"expected 16-bit mono PCM, got $fmt")
      val data = in.readAllBytes()
      val bb = ByteBuffer.wrap(data).order(
        if (fmt.isBigEndian) ByteOrder.BIG_ENDIAN else ByteOrder.LITTLE_ENDIAN)
      val out = new Array[Double](data.length / 2)
      var i = 0
      while (i < out.length) {
        out(i) = bb.getShort(i * 2).toDouble / Short.MaxValue
        i += 1
      }
      (out, fmt.getSampleRate.toInt)
    } finally in.close()
  }

  // 9 log-spaced band edges over 200–3600 Hz (10 edges); centers for the
  // chord fixture sit at the geometric middle of each band.
  private val BandLo = 200.0
  private val BandHi = 3600.0
  private val NBands = 9
  private def bandEdge(k: Int): Double =
    BandLo * math.pow(BandHi / BandLo, k.toDouble / NBands)
  private[pipeline] def bandCenter(b: Int): Double =
    math.sqrt(bandEdge(b) * bandEdge(b + 1))

  /** 64-bit audio fingerprint — the band-energy-gradient construction of
    * Haitsma & Kalker ("A Highly Robust Audio Fingerprint System",
    * ISMIR 2002 — public algorithm; simplified to one frame row per time
    * block): decode PCM → 8 equal time blocks → per-block energy in 9
    * log-spaced frequency bands (direct Goertzel/DFT magnitudes summed
    * over each band's bins) → bit (t,b) = band b+1 energy > band b
    * energy. Uniform gain scales every band energy equally, so the sign
    * pattern — and the hash — is volume-invariant; different spectral
    * content flips many signs. Hamming distance tracks perceptual
    * similarity, same contract as [[Images.phash64]]. */
  def afp64(bytes: Array[Byte]): Long = {
    val (samples, rate) = pcmSamples(bytes)
    val nBlocks = 8
    val blockLen = math.max(1, samples.length / nBlocks)
    var hash = 0L
    var t = 0
    while (t < nBlocks) {
      val off = t * blockLen
      val len = math.min(blockLen, samples.length - off)
      val energies = new Array[Double](NBands)
      var b = 0
      while (b < NBands) {
        // sum DFT bin magnitudes over the band's frequency range
        val lo = bandEdge(b); val hi = bandEdge(b + 1)
        val binHzStep = rate.toDouble / len
        var bin = math.max(1, math.ceil(lo / binHzStep).toInt)
        val binEnd = math.min(len / 2, math.floor(hi / binHzStep).toInt)
        var e = 0.0
        while (bin <= binEnd) {
          // Goertzel recurrence: |DFT bin|² with ONE cosine per bin and a
          // single multiply-add per sample — the naive per-sample
          // cos/sin form was ~450k trig calls per document and made this
          // the bench's slowest operator (6.6 s at sf0.1; Goertzel is the
          // textbook fix for sparse-bin DFTs)
          val c = 2.0 * math.cos(2 * math.Pi * bin / len)
          var s1 = 0.0; var s2 = 0.0
          var i = 0
          while (i < len) {
            val s0 = samples(off + i) + c * s1 - s2
            s2 = s1; s1 = s0
            i += 1
          }
          e += s1 * s1 + s2 * s2 - c * s1 * s2
          bin += 1
        }
        energies(b) = e
        b += 1
      }
      var b2 = 0
      while (b2 < NBands - 1) {
        if (energies(b2 + 1) > energies(b2)) hash |= (1L << (t * 8 + b2))
        b2 += 1
      }
      t += 1
    }
    hash
  }

  /** (sampleRate, nFrames, durationSec, rms∈[0,1]) decoded through the
    * real WAV parser + PCM samples. */
  def decodeStats(bytes: Array[Byte]): (Int, Long, Double, Double) = {
    val in = AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
    try {
      val fmt = in.getFormat
      require(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1,
        s"expected 16-bit mono PCM, got $fmt")
      val frames = in.getFrameLength
      val data = in.readAllBytes()
      val bb = ByteBuffer.wrap(data).order(
        if (fmt.isBigEndian) ByteOrder.BIG_ENDIAN else ByteOrder.LITTLE_ENDIAN)
      var sumSq = 0.0
      var i = 0
      val nSamples = data.length / 2
      while (i < nSamples) {
        val s = bb.getShort(i * 2).toDouble / Short.MaxValue
        sumSq += s * s
        i += 1
      }
      val rate = fmt.getSampleRate.toInt
      (rate, frames, frames.toDouble / rate,
        if (nSamples == 0) 0.0 else math.sqrt(sumSq / nSamples))
    } finally in.close()
  }
}
