package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.core.SplitMix64
import graft.spark.multimodal.{AviMjpeg, GifCodec, JpegCodec, PngCodec}

/** Decoder robustness under malformed input: random bytes, truncations and
  * bit flips of real payloads must either decode or throw one of the
  * expected per-row failure types (what Multimodal.decodeImageStats maps to
  * null) — never hang, OOM, or escape with an unexpected error class. At
  * 100 TB, corrupt payloads are a certainty, and an executor-killing decode
  * is a job-killing decode. */
class CodecFuzzSpec extends AnyFunSuite {

  private def expected(t: Throwable): Boolean = t match {
    case _: IllegalArgumentException | _: IllegalStateException |
         _: IndexOutOfBoundsException | _: NegativeArraySizeException |
         _: java.util.zip.ZipException | _: java.util.zip.DataFormatException |
         _: java.io.EOFException | _: java.util.NoSuchElementException => true
    case _ => false
  }

  private def fuzzOne(name: String, decode: Array[Byte] => Any, payload: Array[Byte]): Unit = {
    try { decode(payload); () }
    catch {
      case t: Throwable =>
        assert(expected(t), s"$name threw unexpected ${t.getClass.getName}: ${t.getMessage}")
    }
  }

  private def decoders: Seq[(String, Array[Byte] => Any)] = Seq(
    ("png", PngCodec.decode _),
    ("gif", GifCodec.decode _),
    ("jpeg", JpegCodec.decode _),
    ("avi", b => if (AviMjpeg.isAvi(b)) AviMjpeg.parse(b) else ()),
    ("warc", b => graft.spark.io.Warc.parse(b).toArray))

  test("pure random bytes never escape the expected failure set") {
    val rng = new SplitMix64(0xfadedbeefL)
    (0 until 200).foreach { i =>
      val len = 4 + Math.floorMod(rng.nextLong(), 512L).toInt
      val b = new Array[Byte](len)
      var j = 0
      while (j < len) { b(j) = (rng.nextLong() >>> 56).toByte; j += 1 }
      decoders.foreach { case (n, d) => fuzzOne(s"$n/random$i", d, b) }
    }
  }

  test("truncations of real payloads fail cleanly at every cut point class") {
    val real: Seq[(String, Array[Byte], Array[Byte] => Any)] = Seq(
      ("png", PngCodec.mkRealPng(7), PngCodec.decode _),
      ("gif", GifCodec.mkRealGif(7), GifCodec.decode _),
      ("jpeg", JpegCodec.mkRealJpeg(7), JpegCodec.decode _),
      ("avi", AviMjpeg.mkAviMjpeg(7), (b: Array[Byte]) =>
        if (AviMjpeg.isAvi(b)) AviMjpeg.parse(b) else ()))
    real.foreach { case (name, full, decode) =>
      // cut at 37 evenly spaced points incl. header-only and one-byte-short
      (0 until 37).foreach { k =>
        val cut = math.max(1, full.length * k / 37)
        fuzzOne(s"$name/trunc@$cut", decode, java.util.Arrays.copyOf(full, cut))
      }
      fuzzOne(s"$name/one-short", decode, java.util.Arrays.copyOf(full, full.length - 1))
    }
  }

  test("AVI chunk sizes near 2^32 terminate with an error, never hang") {
    // review finding: size.toInt overflow once made `end <= to` pass while
    // the walk stopped advancing — an infinite loop on one executor row
    def le32(v: Long): Array[Byte] =
      Array((v & 0xff).toByte, ((v >>> 8) & 0xff).toByte,
        ((v >>> 16) & 0xff).toByte, ((v >>> 24) & 0xff).toByte)
    for (evil <- Seq(0xFFFFFFF8L, 0xFFFFFFF6L, 0xFFFFFFFFL, 0x7FFFFFFFL)) {
      val payload = "RIFF".getBytes("ASCII") ++ le32(256) ++ "AVI ".getBytes("ASCII") ++
        "LIST".getBytes("ASCII") ++ le32(evil) ++ "hdrl".getBytes("ASCII") ++
        new Array[Byte](64)
      val t0 = System.nanoTime()
      intercept[IllegalArgumentException](AviMjpeg.parse(payload))
      assert((System.nanoTime() - t0) / 1e9 < 5.0, s"size $evil took too long")
    }
  }

  test("single-bit flips of real payloads fail cleanly or decode") {
    val rng = new SplitMix64(0x0b17f11b5L)
    val real: Seq[(String, Array[Byte], Array[Byte] => Any)] = Seq(
      ("png", PngCodec.mkRealPng(11), PngCodec.decode _),
      ("gif", GifCodec.mkRealGif(11), GifCodec.decode _),
      ("jpeg", JpegCodec.mkRealJpeg(11), JpegCodec.decode _),
      ("avi", AviMjpeg.mkAviMjpeg(11), (b: Array[Byte]) =>
        if (AviMjpeg.isAvi(b)) AviMjpeg.parse(b) else ()))
    real.foreach { case (name, full, decode) =>
      (0 until 60).foreach { i =>
        val b = full.clone()
        val at = Math.floorMod(rng.nextLong(), b.length.toLong).toInt
        b(at) = (b(at) ^ (1 << Math.floorMod(rng.nextLong(), 8L).toInt)).toByte
        fuzzOne(s"$name/flip$i@$at", decode, b)
      }
    }
  }
}
