package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.spark.multimodal.{GifCodec, ImageHeaders}

/** Real GIF LZW codec: round-trips, dictionary-growth/reset paths, the
  * canonical 1x1 external golden, and header-parser interop. */
class GifSpec extends AnyFunSuite {

  private def mk(w: Int, h: Int, f: (Int, Int) => Int): Array[Byte] = {
    val px = new Array[Byte](w * h)
    for (y <- 0 until h; x <- 0 until w) px(y * w + x) = (f(x, y) % 256).toByte
    px
  }

  test("encode/decode round-trip, gradient and constant images") {
    for ((w, h) <- Seq((1, 1), (8, 8), (19, 7), (40, 40))) {
      val grad = mk(w, h, (x, y) => 3 * x + 5 * y)
      val d = GifCodec.decode(GifCodec.encode(w, h, grad, GifCodec.grayPalette))
      assert(d.width == w && d.height == h)
      assert(java.util.Arrays.equals(d.indices, grad), s"gradient $w x $h")
      val const = mk(w, h, (_, _) => 42)
      val d2 = GifCodec.decode(GifCodec.encode(w, h, const, GifCodec.grayPalette))
      assert(java.util.Arrays.equals(d2.indices, const), s"constant $w x $h")
    }
  }

  test("round-trip survives dictionary growth past every width bump and a 4096 reset") {
    // 128x128 seeded pseudo-random indices force >4096 dictionary entries
    val rnd = new scala.util.Random(7)
    val px = new Array[Byte](128 * 128)
    rnd.nextBytes(px)
    val gif = GifCodec.encode(128, 128, px, GifCodec.grayPalette)
    assert(java.util.Arrays.equals(GifCodec.decode(gif).indices, px))
    // repetitive image: LZW must actually compress (dictionary used)
    val rep = mk(100, 100, (x, y) => (x / 10 + y / 10) % 4)
    val gif2 = GifCodec.encode(100, 100, rep, GifCodec.grayPalette)
    assert(gif2.length < 100 * 100 / 2, s"LZW should compress: ${gif2.length}")
    assert(java.util.Arrays.equals(GifCodec.decode(gif2).indices, rep))
  }

  test("decodes the canonical 1x1 transparent GIF (external golden, with extension block)") {
    val golden = Array(
      0x47, 0x49, 0x46, 0x38, 0x39, 0x61, 0x01, 0x00, 0x01, 0x00, 0x80, 0x00,
      0x00, 0x00, 0x00, 0x00, 0xff, 0xff, 0xff, 0x21, 0xf9, 0x04, 0x01, 0x00,
      0x00, 0x00, 0x00, 0x2c, 0x00, 0x00, 0x00, 0x00, 0x01, 0x00, 0x01, 0x00,
      0x00, 0x02, 0x02, 0x44, 0x01, 0x00, 0x3b).map(_.toByte)
    val d = GifCodec.decode(golden)
    assert(d.width == 1 && d.height == 1)
    assert(d.indices.toSeq == Seq(0.toByte))
    assert((d.palette(0), d.palette(3)) == (0.toByte, 0xff.toByte))
  }

  test("encoded GIFs parse with the header parser and decode the fixture formula") {
    val bytes = GifCodec.mkRealGif(21L)
    assert(ImageHeaders.parse(bytes).exists(m => m.format == "gif" && m.width == 18))
    val d = GifCodec.decode(bytes)
    for (y <- 0 until d.height; x <- 0 until d.width)
      assert(d.indices(y * d.width + x) == ((3 * x + 5 * y + 21) % 256).toByte)
  }

  test("single-byte corruption never hangs: throws or decodes to the right shape") {
    val good = GifCodec.mkRealGif(9L)
    val d0 = GifCodec.decode(good)
    val rnd = new scala.util.Random(3)
    (0 until 200).foreach { _ =>
      val bad = good.clone()
      val i = rnd.nextInt(bad.length)
      bad(i) = (bad(i) ^ (1 << rnd.nextInt(8))).toByte
      try {
        val d = GifCodec.decode(bad)
        assert(d.indices.length == d.width * d.height) // shape stays consistent
      } catch {
        case _: IllegalArgumentException | _: ArrayIndexOutOfBoundsException => () // rejected
      }
    }
    assert(java.util.Arrays.equals(GifCodec.decode(good).indices, d0.indices))
  }

  test("interlaced GIFs decode byte-exactly (vs the JDK's independent codec)") {
    for ((w, h) <- Seq((5, 3), (16, 16), (23, 11))) {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_BYTE_INDEXED)
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y,
        ((11 * x + 23 * y) % 256 << 16) | ((5 * x) % 256 << 8) | (9 * y) % 256)
      val wr = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
      val p = wr.getDefaultWriteParam
      p.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT)
      val bos = new java.io.ByteArrayOutputStream()
      val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
      wr.setOutput(ios)
      wr.write(null, new javax.imageio.IIOImage(img, null, null), p)
      ios.close(); wr.dispose()
      val bytes = bos.toByteArray
      val d = GifCodec.decode(bytes)
      assert(d.width == w && d.height == h)
      // compare against the SOURCE raster's palette indices: the stream is
      // written in correct interlace order and must reconstruct the original
      // exactly. (Not against ImageIO's reader — the JDK's own GIF reader
      // drops a row on small interlaced images, observed here: its read of
      // its own 5x3 interlaced write loses true row 1.)
      val srcRaster = img.getRaster
      for (y <- 0 until h; x <- 0 until w) {
        assert((d.indices(y * w + x) & 0xff) == srcRaster.getSample(x, y, 0),
          s"($x,$y) of $w x $h")
      }
    }
  }

  test("malformed inputs are rejected") {
    intercept[IllegalArgumentException](GifCodec.decode(Array.fill[Byte](20)(3)))
    intercept[Exception](GifCodec.decode(
      GifCodec.encode(4, 4, new Array[Byte](16), GifCodec.grayPalette).take(30)))
  }
}
