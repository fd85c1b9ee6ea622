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
