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

  test("non-baseline and color scans are rejected, not mis-decoded") {
    // color JPEG via ImageIO (3-component YCbCr)
    val img = new java.awt.image.BufferedImage(16, 16,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", out)
    intercept[IllegalArgumentException](JpegCodec.decode(out.toByteArray))
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
