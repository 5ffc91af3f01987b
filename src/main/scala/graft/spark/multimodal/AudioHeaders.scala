package graft.spark.multimodal

import graft.core.SplitMix64

/** Real public-format audio parsing — pure byte-layout work, no codec:
  *
  *  - WAV (RIFF/WAVE, RIFF spec 1991 / MS mmreg): "RIFF" + u32le size +
  *    "WAVE", then a chunk walk; the `fmt ` chunk carries u16le audio format
  *    (1 = integer PCM), channel count, u32le sample rate, u32le byte rate,
  *    u16le block align and bits per sample; the `data` chunk carries the
  *    interleaved little-endian samples. Frame count = data length / block
  *    align, duration = frames / rate.
  *
  * For 16-bit integer PCM the FEATURES are real too (unlike the image side,
  * where feature extraction would need a pixel decoder): zero-crossing count,
  * peak amplitude and RMS over channel 0 are plain arithmetic on the sample
  * words. Anything that is not a RIFF/WAVE payload falls back to the caller's
  * disclosed stub derivation, mirroring [[ImageHeaders]].
  */
object AudioHeaders extends Serializable {

  final case class AudioMeta(format: String, channels: Int, sampleRate: Int,
                             bitsPerSample: Int, nFrames: Long) {
    /** Floor milliseconds, exact for the fixture rates. */
    def durationMs: Long = if (sampleRate <= 0) 0L else nFrames * 1000L / sampleRate
  }

  /** Channel-0 PCM16 features: sign-change count, max |sample|, floor-RMS. */
  final case class PcmFeatures(zeroCrossings: Long, peak: Int, rms: Long)

  private def u16le(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
  private def u32le(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) | ((b(i + 2) & 0xffL) << 16) |
      ((b(i + 3) & 0xffL) << 24)
  private def i16le(b: Array[Byte], i: Int): Int = (u16le(b, i) << 16) >> 16

  private def tag(b: Array[Byte], i: Int, t: String): Boolean =
    b(i) == t.charAt(0) && b(i + 1) == t.charAt(1) &&
      b(i + 2) == t.charAt(2) && b(i + 3) == t.charAt(3)

  /** Parsed WAV: metadata plus the data chunk's (offset, length) for the
    * feature pass. None for anything that is not integer-PCM RIFF/WAVE. */
  final case class Wav(meta: AudioMeta, dataOff: Int, dataLen: Int, blockAlign: Int)

  def parseWav(b: Array[Byte]): Option[Wav] = {
    if (b == null || b.length < 44) return None
    if (!tag(b, 0, "RIFF") || !tag(b, 8, "WAVE")) return None
    var i = 12
    var fmtOk = false
    var channels = 0; var rate = 0; var bits = 0; var blockAlign = 0
    var dataOff = -1; var dataLen = 0
    while (i + 8 <= b.length) {
      val len = u32le(b, i + 4)
      val body = i + 8
      if (tag(b, i, "fmt ") && len >= 16 && body + 16 <= b.length) {
        val audioFormat = u16le(b, body)
        channels = u16le(b, body + 2)
        rate = u32le(b, body + 4).toInt
        blockAlign = u16le(b, body + 12)
        bits = u16le(b, body + 14)
        fmtOk = audioFormat == 1 && channels > 0 && rate > 0 && blockAlign > 0
      } else if (tag(b, i, "data")) {
        dataOff = body
        dataLen = math.min(len, (b.length - body).toLong).toInt
      }
      // chunks are word-aligned: odd lengths carry a pad byte. Clamp the
      // step to the remaining bytes BEFORE narrowing: a corrupt u32 length
      // near 2^32 would overflow toInt to a negative step and stall the walk
      // (an executor-hanging infinite loop on malformed input).
      val step = math.min(len, (b.length - body).toLong).toInt
      i = body + step + (step & 1)
    }
    if (!fmtOk || dataOff < 0) None
    else {
      val frames = dataLen.toLong / blockAlign
      Some(Wav(AudioMeta("wav", channels, rate, bits, frames), dataOff, dataLen, blockAlign))
    }
  }

  def parse(b: Array[Byte]): Option[AudioMeta] = parseWav(b).map(_.meta)

  /** Real feature extraction over channel 0 of a 16-bit PCM WAV: a zero
    * crossing is a sign change between consecutive frames (sign of 0 counts
    * as positive); peak is max |sample|; rms is floor(sqrt(mean(s^2))). */
  def pcm16Features(b: Array[Byte]): Option[PcmFeatures] =
    parseWav(b).filter(w => w.meta.bitsPerSample == 16 && w.meta.nFrames > 0).map { w =>
      var f = 0L
      var crossings = 0L
      var peak = 0
      var sumSq = 0.0
      var prevNonNeg = true
      while (f < w.meta.nFrames) {
        val s = i16le(b, w.dataOff + (f * w.blockAlign).toInt)
        val nonNeg = s >= 0
        if (f > 0 && nonNeg != prevNonNeg) crossings += 1
        prevNonNeg = nonNeg
        val a = math.abs(s)
        if (a > peak) peak = a
        sumSq += s.toDouble * s.toDouble
        f += 1
      }
      PcmFeatures(crossings, peak, math.floor(math.sqrt(sumSq / w.meta.nFrames)).toLong)
    }

  // ---- deterministic real-format WAV generation (test/verify fixture) ----

  /** Frame count of every fixture clip. */
  val FixtureFrames = 480

  /** Deterministic 16-bit PCM WAV with a REAL RIFF/WAVE layout. Clip i is a
    * square wave, so every feature has a closed form the DuckDB oracle can
    * recompute from i alone:
    *
    *  - channels  = 1 + (i % 2)            (signal duplicated across channels)
    *  - rate      = 8000 * (1 + (i % 3))   -> duration_ms = 480000 / rate
    *  - amplitude = 1000 + (i % 100) * 300 (max 30700 < 2^15)
    *  - period    = 2 + (i % 31)           half-period in frames
    *  - frame t   = +amp when (t / period) is even, else -amp
    *  - zero crossings = (480 - 1) / period   (sign flips at multiples of period)
    *  - peak = rms = amplitude                (square wave: every |sample| = amp)
    */
  def mkWav(i: Long): Array[Byte] = {
    val channels = 1 + (i % 2).toInt
    val rate = 8000 * (1 + (i % 3).toInt)
    val amp = 1000 + (i % 100).toInt * 300
    val period = 2 + (i % 31).toInt
    val blockAlign = channels * 2
    val dataLen = FixtureFrames * blockAlign
    val out = new Array[Byte](44 + dataLen)
    def put(off: Int, t: String): Unit = {
      var j = 0
      while (j < t.length) { out(off + j) = t.charAt(j).toByte; j += 1 }
    }
    def put16(off: Int, v: Int): Unit = {
      out(off) = v.toByte; out(off + 1) = (v >>> 8).toByte
    }
    def put32(off: Int, v: Int): Unit = {
      out(off) = v.toByte; out(off + 1) = (v >>> 8).toByte
      out(off + 2) = (v >>> 16).toByte; out(off + 3) = (v >>> 24).toByte
    }
    put(0, "RIFF"); put32(4, 36 + dataLen); put(8, "WAVE")
    put(12, "fmt "); put32(16, 16)
    put16(20, 1) // integer PCM
    put16(22, channels)
    put32(24, rate)
    put32(28, rate * blockAlign) // byte rate
    put16(32, blockAlign)
    put16(34, 16) // bits per sample
    put(36, "data"); put32(40, dataLen)
    var t = 0
    while (t < FixtureFrames) {
      val s = if ((t / period) % 2 == 0) amp else -amp
      var c = 0
      while (c < channels) {
        put16(44 + t * blockAlign + c * 2, s & 0xffff)
        c += 1
      }
      t += 1
    }
    out
  }

  /** Deterministic NON-wav payload (for stub-fallback tests): body bytes only. */
  def mkOpaque(i: Long, n: Int = 64): Array[Byte] = {
    val rng = new SplitMix64(0x5151aa77L ^ i)
    val out = new Array[Byte](n)
    var j = 0
    while (j < n) { out(j) = (rng.nextLong() >>> 56).toByte; j += 1 }
    out
  }
}
