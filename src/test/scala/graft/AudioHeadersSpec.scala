package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.spark.multimodal.AudioHeaders

/** Real RIFF/WAVE parsing + PCM16 feature kernels (Round2Spec sibling). */
class AudioHeadersSpec extends AnyFunSuite {

  test("generated WAV fixtures parse to the closed formulas") {
    (0L until 300L).foreach { i =>
      val wav = AudioHeaders.mkWav(i)
      val m = AudioHeaders.parse(wav).get
      assert(m.format == "wav" && m.bitsPerSample == 16, s"clip $i format")
      assert(m.channels == 1 + (i % 2).toInt, s"clip $i channels")
      assert(m.sampleRate == 8000 * (1 + (i % 3).toInt), s"clip $i rate")
      assert(m.nFrames == AudioHeaders.FixtureFrames.toLong, s"clip $i frames")
      assert(m.durationMs == 480000L / m.sampleRate, s"clip $i duration")
    }
  }

  test("PCM16 features match brute force AND the closed square-wave forms") {
    (0L until 300L).foreach { i =>
      val amp = 1000 + (i % 100).toInt * 300
      val period = 2 + (i % 31).toInt
      val f = AudioHeaders.pcm16Features(AudioHeaders.mkWav(i)).get
      // brute-force recompute from the generator formula
      val samples = (0 until AudioHeaders.FixtureFrames)
        .map(t => if ((t / period) % 2 == 0) amp else -amp)
      val brute = samples.sliding(2).count(p => (p(0) >= 0) != (p(1) >= 0))
      assert(f.zeroCrossings == brute, s"clip $i crossings vs brute")
      assert(f.zeroCrossings == (AudioHeaders.FixtureFrames - 1) / period,
        s"clip $i crossings vs closed form")
      assert(f.peak == amp && f.rms == amp, s"clip $i peak/rms")
    }
  }

  test("hand-built WAV: chunk walk skips unknown chunks, odd-length padding") {
    // RIFF/WAVE with a junk chunk (odd length -> pad byte) before fmt/data
    val frames = 4
    val data = Array[Byte](0x10, 0x00, 0xf0.toByte, 0xff.toByte, // +16, -16
                           0x00, 0x00, 0x05, 0x00)               // 0, +5
    def le16(v: Int) = Array[Byte](v.toByte, (v >>> 8).toByte)
    def le32(v: Int) =
      Array[Byte](v.toByte, (v >>> 8).toByte, (v >>> 16).toByte, (v >>> 24).toByte)
    val junk = "JUNK".getBytes ++ le32(3) ++ Array[Byte](1, 2, 3, 0) // padded
    val fmt = "fmt ".getBytes ++ le32(16) ++ le16(1) ++ le16(1) ++ le32(4000) ++
      le32(8000) ++ le16(2) ++ le16(16)
    val body = junk ++ fmt ++ "data".getBytes ++ le32(data.length) ++ data
    val wav = "RIFF".getBytes ++ le32(4 + body.length) ++ "WAVE".getBytes ++ body
    val w = AudioHeaders.parseWav(wav).get
    assert(w.meta.channels == 1 && w.meta.sampleRate == 4000 && w.meta.nFrames == frames)
    val f = AudioHeaders.pcm16Features(wav).get
    // samples: +16, -16, 0, +5 -> crossings at 1 (+->-) and 2 (- -> 0, zero is
    // non-negative); peak 16; rms = floor(sqrt((256+256+0+25)/4)) = 11
    assert(f.zeroCrossings == 2 && f.peak == 16 && f.rms == 11)
  }

  test("corrupt chunk length near 2^32 terminates the walk (no hang)") {
    def le16(v: Int) = Array[Byte](v.toByte, (v >>> 8).toByte)
    def le32(v: Long) = Array[Byte](v.toByte, (v >>> 8).toByte,
      (v >>> 16).toByte, (v >>> 24).toByte)
    // fmt is valid but a junk chunk claims size 0xFFFFFFFE, hiding data
    val fmt = "fmt ".getBytes ++ le32(16) ++ le16(1) ++ le16(1) ++ le32(8000) ++
      le32(16000) ++ le16(2) ++ le16(16)
    val junk = "JUNK".getBytes ++ le32(0xfffffffeL) ++ new Array[Byte](8)
    val data = "data".getBytes ++ le32(4) ++ new Array[Byte](4)
    val body = fmt ++ junk ++ data
    val wav = "RIFF".getBytes ++ le32(4L + body.length) ++ "WAVE".getBytes ++ body
    // data is unreachable behind the corrupt chunk -> None, but must return
    assert(AudioHeaders.parse(wav).isEmpty)
  }

  test("non-WAV payloads fall back to None (stub path in Multimodal)") {
    assert(AudioHeaders.parse(AudioHeaders.mkOpaque(7L)).isEmpty)
    assert(AudioHeaders.parse(null).isEmpty)
    assert(AudioHeaders.parse(Array[Byte](1, 2, 3)).isEmpty)
    // RIFF but not WAVE
    assert(AudioHeaders.parse("RIFFxxxxAVI LIST".getBytes ++ new Array[Byte](40)).isEmpty)
    // float PCM (format 3) is not integer PCM -> rejected
    def le16(v: Int) = Array[Byte](v.toByte, (v >>> 8).toByte)
    def le32(v: Int) =
      Array[Byte](v.toByte, (v >>> 8).toByte, (v >>> 16).toByte, (v >>> 24).toByte)
    val fmt3 = "fmt ".getBytes ++ le32(16) ++ le16(3) ++ le16(1) ++ le32(8000) ++
      le32(32000) ++ le16(4) ++ le16(32)
    val body = fmt3 ++ "data".getBytes ++ le32(8) ++ new Array[Byte](8)
    val wav = "RIFF".getBytes ++ le32(4 + body.length) ++ "WAVE".getBytes ++ body
    assert(AudioHeaders.parse(wav).isEmpty)
  }
}
