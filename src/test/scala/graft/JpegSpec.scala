package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.spark.multimodal.JpegCodec

/** From-scratch baseline JPEG decoder vs the JDK's independent ImageIO
  * codec: T.81 permits IDCT tolerance, so agreement is pinned to a small
  * per-pixel bound, not equality. */
class JpegSpec extends AnyFunSuite {

  private def maxDev(a: Array[Byte], b: Array[Byte]): Int = {
    var m = 0
    var i = 0
    while (i < a.length) {
      val d = math.abs((a(i) & 0xff) - (b(i) & 0xff))
      if (d > m) m = d
      i += 1
    }
    m
  }

  test("decodes ImageIO-encoded grayscale JPEGs within IDCT tolerance") {
    var worst = 0
    (0L until 64L).foreach { i =>
      val bytes = JpegCodec.mkRealJpeg(i)
      val mine = JpegCodec.decode(bytes)
      val ref = JpegCodec.decodeWithImageIO(bytes)
      assert(mine.width == ref.width && mine.height == ref.height, s"dims img $i")
      val d = maxDev(mine.pixels, ref.pixels)
      worst = math.max(worst, d)
      assert(d <= 2, s"img $i max per-pixel deviation $d")
    }
    info(s"worst per-pixel deviation across 64 images: $worst")
  }

  test("header parser agrees on JPEG dimensions") {
    val bytes = JpegCodec.mkRealJpeg(33L)
    val meta = graft.spark.multimodal.ImageHeaders.parse(bytes)
    assert(meta.exists(m => m.format == "jpeg" && m.width == 10 && m.height == 12))
  }

  test("decodes ImageIO-encoded 4:2:0 COLOR JPEGs close to the reference decoder") {
    // color tolerance is looser than gray: the JDK reader upsamples chroma
    // with libjpeg's triangle filter, this decoder uses nearest — on the
    // smooth gradient fixtures that bounds the difference tightly
    var worst = 0
    var worstMean = 0.0
    (0L until 48L).foreach { i =>
      val bytes = JpegCodec.mkRealJpegColor(i)
      val mine = JpegCodec.decode(bytes)
      val ref = JpegCodec.decodeWithImageIO(bytes)
      assert(mine.width == ref.width && mine.height == ref.height && mine.channels == 3)
      val d = maxDev(mine.pixels, ref.pixels)
      var sum = 0L
      var j = 0
      while (j < mine.pixels.length) {
        sum += math.abs((mine.pixels(j) & 0xff) - (ref.pixels(j) & 0xff)); j += 1
      }
      val mean = sum.toDouble / mine.pixels.length
      worst = math.max(worst, d)
      worstMean = math.max(worstMean, mean)
      assert(d <= 4, s"img $i max per-pixel deviation $d")
      assert(mean <= 0.5, s"img $i mean deviation $mean")
    }
    info(f"color: worst max-dev $worst, worst mean-dev $worstMean%.3f across 48 images")
  }

  test("malformed inputs are rejected, not mis-decoded") {
    intercept[IllegalArgumentException](JpegCodec.decode(Array.fill[Byte](32)(7)))
    intercept[Exception](JpegCodec.decode(JpegCodec.mkRealJpeg(1L).take(60)))
  }

  test("single-byte corruption never hangs: throws or decodes shape-consistently") {
    val good = JpegCodec.mkRealJpeg(6L)
    val rnd = new scala.util.Random(13)
    (0 until 150).foreach { _ =>
      val bad = good.clone()
      val i = rnd.nextInt(bad.length)
      bad(i) = (bad(i) ^ (1 << rnd.nextInt(8))).toByte
      try {
        val d = JpegCodec.decode(bad)
        assert(d.pixels.length == d.width * d.height)
      } catch {
        case _: RuntimeException | _: ArrayIndexOutOfBoundsException |
             _: NegativeArraySizeException => ()
      }
    }
  }
}
